"""Byte-level serde wire goldens — `(ser x)` output recorded from the
reference binary (tools/oracle.py tests/cases/serde_wire.json): the
16-byte 0xcefadefa header + recursive little-endian payloads are
byte-identical across atoms, vectors, strings, symbols, dicts, tables,
mixed lists, temporals, bools, u8, and GUIDs — the IPC interop
contract. (I16 VECTORS are a documented superset: the reference's own
serializer type-errors on them; ours round-trips.)
"""
from golden_util import golden_suite

test_serde_wire = golden_suite("serde_wire.json")
