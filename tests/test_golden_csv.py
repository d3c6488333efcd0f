"""CSV reader goldens recorded from the reference binary
(core/io.c:367-632 parse_csv_field/parse_csv_line/io_read_csv).

Pinned semantics:
- quote rule (io.c:491-505): a field STARTING with '"' runs to the
  next '"', no doubled-quote escapes;
- null rule (io.c:473-532): only a field that STARTS at line end is a
  typed null — an empty field followed by a separator is a
  zero-length span that parses as 0 / 0.0 / false / 0Ns;
- prefix number parses (string.c i64_from_str/f64_from_str): sign is
  '-' ONLY ('+' reads as no digits -> 0), junk after the numeric
  prefix is ignored, "inf"/hex don't parse;
- b8_from_str (string.c:108): "true"/"True"/"TRUE" prefix;
- time_from_str (time.c:55): ':' and '.' both advance fields, ms is
  RAW (".5" = 5 ms), h/m/s wrap u8, '-' anywhere flips sign;
- timestamp_from_str (timestamp.c:362): ISO when char 4 is '-'
  (fraction padded to ns, Z/+hh:mm applied), else digit runs with RAW
  nanos; a plain integer is NOT a timestamp;
- short non-blank lines are length errors (io.c:520-523), blank
  lines parse as all-null rows, extra fields are ignored.

Documented supersets (probed live, not pinned):
- a MALFORMED or empty-middle DATE field: the reference feeds the
  null datestruct through date_into_i32 without checking .null
  (io.c:407, date.c date_into_i32) and renders garbage
  ("0000.01.90"); we yield 0Nd;
- a MISSING symbol field writes raw id 0, which renders as whatever
  symbol the binary interned first ("fn") — incidental global state;
  we yield 0Ns.
"""
from golden_util import golden_suite

test_csv_oracle = golden_suite("csv_oracle.json")
