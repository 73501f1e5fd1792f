"""Benchmark: IPM throughput + objective parity on the reference examples.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

value        = IPM iterations/second on arch0 (the reference's first
               bundled example: truss SDP, K.s=[161,174], m=174), measured
               on a warm (compiled) solve.
vs_baseline  = fraction of the attempted reference examples whose objective
               matches the published optimum within the reference's own
               acceptance test (test_sedumi.m: rel 1e-6; control07 gated at
               2.5e-6 — its published value is SDPLIB's 6-digit value, see
               tests/test_examples.py docstring).

Env:
  SEDUMI_BENCH_EXAMPLES  comma list (default "quantum,nb,arch0")
  SEDUMI_BENCH_TIMED     example used for the timed metric (default arch0)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    from sedumi_tpu import sedumi
    from sedumi_tpu.examples import load_example

    names = os.environ.get("SEDUMI_BENCH_EXAMPLES", "quantum,nb,arch0").split(",")
    timed_name = os.environ.get("SEDUMI_BENCH_TIMED", "arch0")
    tols = {"control07": 2.5e-6}

    passes = 0
    attempted = 0
    timed_iter_per_sec = 0.0
    for name in names:
        name = name.strip()
        ex = load_example(name)
        attempted += 1
        try:
            t0 = time.time()
            x, y, info = sedumi(ex.At, ex.b, ex.c, ex.K, {"fid": 0})
            wall_cold = time.time() - t0
            cx = float(np.real(np.vdot(ex.c, x)))
            by = float(np.real(np.vdot(ex.b, y)))
            tol = tols.get(name, 1e-6)
            ok = (
                abs(cx - ex.optval) <= tol * abs(ex.optval)
                and abs(by - ex.optval) <= tol * abs(ex.optval)
                and info["pinf"] == 0
                and info["dinf"] == 0
                and info["numerr"] < 2
            )
            passes += int(ok)
            print(
                f"# {name}: rel={abs(cx-ex.optval)/abs(ex.optval):.2e} "
                f"iter={info['iter']} numerr={info['numerr']} cold={wall_cold:.1f}s",
                file=sys.stderr,
            )
            if name == timed_name:
                t0 = time.time()
                _, _, info2 = sedumi(ex.At, ex.b, ex.c, ex.K, {"fid": 0})
                warm = time.time() - t0
                timed_iter_per_sec = info2["iter"] / max(info2["timing"][1], 1e-9)
                print(f"# {name} warm: {warm:.1f}s "
                      f"({timed_iter_per_sec:.2f} it/s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"{timed_name}_ipm_iterations_per_sec",
                "value": round(timed_iter_per_sec, 4),
                "unit": "iter/s",
                "vs_baseline": round(passes / max(attempted, 1), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
