"""Benchmark: objective parity on all six reference examples + throughput.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., ...}

value        = IPM iterations/second on the timed example (default arch0),
               measured on a warm (compiled) solve.
vs_baseline  = fraction of attempted reference examples whose objective
               matches the published optimum within the reference's own
               acceptance test (test_sedumi.m:30,41-43: rel 1e-6 on c'x and
               b'y, pinf=dinf=0, numerr<2).
extra keys   = per-phase device TFLOP/s on the timed example
               (profiling.profile_iteration; BASELINE.md's "Schur+Chol at
               speed-of-light per chip" metric) and per-example detail.

Env:
  SEDUMI_BENCH_EXAMPLES  comma list (default: all six)
  SEDUMI_BENCH_TIMED     example used for the timed metric (default arch0)
  SEDUMI_BENCH_DEADLINE  global wall-clock budget in seconds (default 3000);
                         a watchdog thread prints the JSON line with partial
                         results and hard-exits — a wedged device tunnel
                         (observed: axon claim held by a dead client blocks
                         every device op indefinitely) must not turn the
                         bench into a silent hang.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

ALL_SIX = "quantum,nb,arch0,control07,trto3,OH_2Pi_STO-6GN9r12g1T2"

_RESULT: dict = {"metric": "bench_incomplete", "value": 0.0, "unit": "iter/s",
                 "vs_baseline": 0.0, "examples": {}}


def _emit_and_exit():
    print(json.dumps(_RESULT), flush=True)
    os._exit(0)


def _arm_watchdog():
    deadline = float(os.environ.get("SEDUMI_BENCH_DEADLINE", "3000"))

    def fire():
        _RESULT["examples"].setdefault(
            "_watchdog", f"deadline {deadline:.0f}s hit; partial results")
        _emit_and_exit()

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


def main() -> None:
    from sedumi_tpu import sedumi
    from sedumi_tpu.examples import load_example

    _arm_watchdog()
    names = os.environ.get("SEDUMI_BENCH_EXAMPLES", ALL_SIX).split(",")
    timed_name = os.environ.get("SEDUMI_BENCH_TIMED", "arch0")

    passes = 0
    attempted = 0
    timed_iter_per_sec = 0.0
    profile = {}
    detail = _RESULT["examples"]   # shared with the watchdog for partials
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
            rel = max(abs(cx - ex.optval), abs(by - ex.optval)) / abs(ex.optval)
            ok = (
                rel <= 1e-6
                and info["pinf"] == 0
                and info["dinf"] == 0
                and info["numerr"] < 2
            )
            passes += int(ok)
            _RESULT["vs_baseline"] = round(passes / max(attempted, 1), 4)
            detail[name] = {"rel": float(f"{rel:.3e}"), "iter": info["iter"],
                            "numerr": info["numerr"],
                            "cold_s": round(wall_cold, 1), "pass": bool(ok)}
            print(f"# {name}: rel={rel:.2e} iter={info['iter']} "
                  f"numerr={info['numerr']} cold={wall_cold:.1f}s pass={ok}",
                  file=sys.stderr)
            if name == timed_name:
                t0 = time.time()
                _, _, info2 = sedumi(ex.At, ex.b, ex.c, ex.K,
                                     {"fid": 0, "profile": 1})
                warm = time.time() - t0
                timed_iter_per_sec = info2["iter"] / max(info2["timing"][1], 1e-9)
                _RESULT["value"] = round(timed_iter_per_sec, 4)
                _RESULT["metric"] = f"{timed_name}_ipm_iterations_per_sec"
                profile = {k: v for k, v in info2.get("profile", {}).items()
                           if k.endswith("_ms") or k.endswith("_tflops")}
                print(f"# {name} warm: {warm:.1f}s "
                      f"({timed_iter_per_sec:.2f} it/s) profile={profile}",
                      file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            detail[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"# {name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)

    _RESULT.update(
        metric=f"{timed_name}_ipm_iterations_per_sec",
        value=round(timed_iter_per_sec, 4),
        vs_baseline=round(passes / max(attempted, 1), 4),
        profile=profile,
    )
    print(json.dumps(_RESULT), flush=True)


if __name__ == "__main__":
    main()
