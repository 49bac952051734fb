"""Driver contract: bench.py must print one JSON line with the agreed keys;
__graft_entry__ must expose entry() and dryrun_multichip(n)."""

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_bench_tiny_json_line():
    env = dict(os.environ, BENCH_TINY="1", BENCH_SCAN="2")
    out = subprocess.run([sys.executable, str(ROOT / "bench.py")],
                         capture_output=True, text=True, env=env,
                         timeout=900, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    # required driver keys plus the honesty fields added in r2
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["unit"] == "frames/sec/chip"
    assert rec["value"] > 0
    assert 0 < rec["mfu"] <= 1.0
    assert rec["flops_per_frame"] > 0


def test_graft_entry_surface():
    import importlib

    os.environ["GRAFT_TINY"] = "1"
    sys.path.insert(0, str(ROOT))
    g = importlib.import_module("__graft_entry__")
    assert callable(g.entry) and callable(g.dryrun_multichip)
    fn, args = g.entry()
    assert len(args) == 3  # (variables, points, points_valid)
