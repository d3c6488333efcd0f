"""Example rayforce-tpu plugin: load with
  (set vwap (loadfn "examples/plugin_example.py" 'vwap 2))
  (vwap prices sizes)
Functions take and return engine Objs (the reference's C plugin ABI,
ext/example, maps to Python modules here — which can wrap C via
ctypes exactly like storage/native.py does)."""
import numpy as np

from rayforce_tpu.core.obj import Obj, to_np
from rayforce_tpu.core import types as T


def vwap(prices, sizes):
    p = to_np(prices).astype(np.float64)
    s = to_np(sizes).astype(np.float64)
    tot = float((p * s).sum())
    den = float(s.sum())
    return Obj(-T.F64, np.float64(tot / den if den else np.nan))
