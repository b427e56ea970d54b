"""Round-5 TPU validation batch.

Waits for the (flaky) axon tunnel, then runs each hardware check in its own
subprocess with a timeout so one wedge doesn't sink the batch. Run with the
ambient env intact (JAX_PLATFORMS=axon, PYTHONPATH=/root/.axon_site).

Stages:
  1. PRNG contract checks (tools/tpu_check_prng.py): sub-block PRNG makes
     the merit forward/backward regenerate identical samples; sharded(1)
     fused merit == unsharded.
  2. Headline bench (fused merit, 2^24 rays).
  3. BENCH_MESH=1 bench: sharded fused merit (the round-4 gap: the sharded
     path previously wrapped the unfused kernel at 66% of headline).
  4. BENCH_SYSTEM=huygens: Huygens summation kernel fwd / fwd+adjoint.
  5. BENCH_SYSTEM=grid_sag: after the round-5 grid-sag work.

Results land in tools/tpu_r5_results.jsonl (one JSON line per bench).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("OPTILAND_TPU_X64", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "tools", "tpu_r5_results.jsonl")
WAIT_MAX = float(os.environ.get("TPU_WAIT_MAX", 7200))
PROBE_EVERY = 240


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def record(tag, line):
    with open(RESULTS, "a") as f:
        f.write(json.dumps({"tag": tag, "ts": time.strftime("%F %T"),
                            "result": line}) + "\n")


def wait_for_tpu():
    t0 = time.time()
    while time.time() - t0 < WAIT_MAX:
        try:
            r = subprocess.run(
                ["timeout", "110", sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.arange(8.0).sum()))"],
                capture_output=True, text=True,
            )
            if "28.0" in r.stdout:
                log("TPU tunnel responsive")
                return True
        except Exception:
            pass
        log("tunnel not responding; retrying")
        time.sleep(PROBE_EVERY)
    return False


def run_script(tag, argv, timeout_s, env_extra=None):
    log(f"=== {tag} ===")
    t0 = time.time()
    env = {**os.environ, **(env_extra or {})}
    r = subprocess.run(
        ["timeout", str(timeout_s), sys.executable, *argv],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    tail = lines[-3:] if lines else ["NO OUTPUT"]
    for ln in tail:
        log(f"  {ln}")
    json_lines = [ln for ln in lines if ln.startswith("{")]
    record(tag, json_lines[-1] if json_lines else " / ".join(tail))
    if r.returncode != 0:
        log(f"  rc={r.returncode} stderr tail: {r.stderr[-500:]}")
        record(tag + ":stderr", r.stderr[-500:])
    log(f"=== {tag} done ({time.time() - t0:.0f}s) ===")
    return r


def main():
    if not wait_for_tpu():
        log("TPU never became responsive; aborting")
        sys.exit(1)
    stages = [
        ("prng-contract", ["tools/tpu_check_prng.py"], 2400, None),
        ("bench-headline", ["bench.py"], 2400, None),
        ("bench-mesh1-fused", ["bench.py"], 2400, {"BENCH_MESH": "1"}),
        ("bench-huygens", ["bench.py"], 2400, {"BENCH_SYSTEM": "huygens"}),
        ("bench-grid-sag", ["bench.py"], 2400, {"BENCH_SYSTEM": "grid_sag"}),
        ("bench-nurbs", ["bench.py"], 2400,
         {"BENCH_SYSTEM": "nurbs", "BENCH_RAYS": "4194304",
          "BENCH_ITERS": "3", "BENCH_INNER": "4"}),
        # full PROFILE.md table refresh (round-5 numbers for every class)
        ("bench-unfused", ["bench.py"], 2400, {"BENCH_FUSED": "0"}),
        ("bench-mesh1-unfused", ["bench.py"], 2400,
         {"BENCH_MESH": "1", "BENCH_FUSED": "0"}),
        ("bench-tilted-asphere", ["bench.py"], 2400,
         {"BENCH_SYSTEM": "tilted_asphere"}),
        ("bench-poly", ["bench.py"], 2400, {"BENCH_SYSTEM": "poly"}),
        ("bench-polarized", ["bench.py"], 2400,
         {"BENCH_SYSTEM": "polarized"}),
        ("bench-polarized-axis", ["bench.py"], 2400,
         {"BENCH_SYSTEM": "polarized_axis"}),
        ("bench-polarized-tmm", ["bench.py"], 2400,
         {"BENCH_SYSTEM": "polarized_tmm"}),
        ("bench-grating", ["bench.py"], 2400, {"BENCH_SYSTEM": "grating"}),
        ("bench-pol-sharded", ["bench.py"], 2400,
         {"BENCH_MESH": "1", "BENCH_SYSTEM": "polarized"}),
    ]
    only = os.environ.get("R5_STAGES")
    for tag, argv, tmo, env in stages:
        if only and tag not in only:
            continue
        run_script(tag, argv, tmo, env)
        # let the tunnel settle between heavy stages
        time.sleep(10)
    log("batch complete")


if __name__ == "__main__":
    main()
