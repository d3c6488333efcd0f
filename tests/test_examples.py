"""Every example script must run end-to-end (the reference treats
examples/ as its acceptance workload, SURVEY Appendix B)."""
import os
import glob

import pytest

EXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
SCRIPTS = sorted(glob.glob(os.path.join(EXDIR, "*.rfl")))


@pytest.mark.parametrize("path", SCRIPTS,
                         ids=[os.path.basename(p) for p in SCRIPTS])
def test_example_runs(path, capsys):
    from rayforce_tpu import Runtime
    rt = Runtime()
    src = open(path).read()
    # keep example sizes small under test
    rt.interp.globals[__import__(
        "rayforce_tpu.core.symbols", fromlist=["intern"]
    ).intern("n")] = __import__(
        "rayforce_tpu.core.obj", fromlist=["i64"]).i64(2000)
    rt.eval_str(src)
