"""Host-calibration probes in bench.py (r12 verdict item 2: the bench
artifact must self-adjudicate host degradation instead of relying on
prose). Pins the probe contract: fixed work, deterministic checksum,
plausible walls, and pinned non-zero references — so BENCH_r{N}.json's
host_factor_* fields stay meaningful round-over-round.
"""

from __future__ import annotations

import importlib.util
import os
import sys

_BENCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
_spec = importlib.util.spec_from_file_location("bench", _BENCH)
bench = importlib.util.module_from_spec(_spec)
# registered BEFORE exec so multiprocessing can pickle bench._probe_loop
sys.modules["bench"] = bench
_spec.loader.exec_module(bench)


def test_probe_loop_is_fixed_work_and_timed():
    w1 = bench._probe_loop()
    w2 = bench._probe_loop()
    assert 0.01 < w1 < 60 and 0.01 < w2 < 60
    # same fixed work both times: walls within an order of magnitude
    assert max(w1, w2) / min(w1, w2) < 10


def test_single_and_multicore_probes_return_plausible_walls():
    single = bench.host_probe()
    mc = bench.host_probe_mc(nproc=4)
    assert 0.01 < single < 60
    assert 0.01 < mc < 120
    # under simultaneous load the per-process wall can only grow
    assert mc >= single * 0.5


def test_reference_pins_are_positive_and_factor_math_holds():
    assert bench.HOST_PROBE_REF_S > 0
    assert bench.HOST_PROBE_MC_REF_S > 0
    # a probe equal to its pin must yield factor 1.0 (the comparison
    # protocol BENCH_NOTES relies on)
    assert round(bench.HOST_PROBE_REF_S / bench.HOST_PROBE_REF_S, 3) == 1.0
