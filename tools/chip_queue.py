"""Run the ENTIRE round-4 on-chip measurement queue unattended.

The TPU tunnel has been flaky across rounds (round 3 lost its device
mid-round and the official bench recorded 0.0). The moment a device is
back, ONE command should capture every queued measurement before the
window closes:

    python tools/chip_queue.py            # full queue (~30-45 min)
    python tools/chip_queue.py --quick    # helmet-only essentials

Each step runs in its OWN subprocess (a faulted TPU worker wedges the
device for that process only), serialized (one process may own the TPU),
with a timeout; results append as JSON lines to CHIP_QUEUE_RESULTS.jsonl
at the repo root with the step name, env, elapsed, and the bench JSON /
stdout tail. Two consecutive dead-tunnel zeros abort the queue.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
OUT = os.path.join(ROOT, "CHIP_QUEUE_RESULTS.jsonl")

BENCH_SIZE = {"BENCH_WIDTH": "1920", "BENCH_HEIGHT": "1080"}


def tunnel_alive() -> bool:
    s = socket.socket()
    s.settimeout(5)
    try:
        s.connect(("127.0.0.1", 8082))
        return True
    except OSError:
        return False
    finally:
        s.close()


def steps(quick: bool):
    """(name, argv, env, timeout_s) in priority order: plain numbers first
    (a dead tunnel mid-queue should cost the A/Bs, not the headline).

    Round-5b queue (post shading-path pred/layout batch): f16 quad tables
    (GLTF_TPU_QUADF32=1 reverts to f32 storage for the A/B), float
    present/corner masks everywhere, shadowpre bookkeeping de-pred'd —
    re-testing shadowpre at spp4 because its measured loss predates the
    pred-layout discovery."""
    bench = [sys.executable, "bench.py"]
    out = [
        ("helmet", bench, {}, 900),                      # spp4 default
        ("helmet_quadf32", bench, {"GLTF_TPU_QUADF32": "1"}, 900),
        ("courtyard", bench, {"BENCH_SCENE": "courtyard"}, 1200),
    ]
    if quick:
        return out
    out += [
        ("courtyard_shadowpre", bench,
         {"BENCH_SCENE": "courtyard", "GLTF_TPU_SHADOWPRE": "64"}, 1200),
        ("raster_frame", [sys.executable, "tools/bench_raster.py"], {}, 1200),
        ("helmet_spp1", bench, {"BENCH_SPP": "1"}, 900),
    ]
    return out


def run_step(name, argv, env, timeout):
    full_env = dict(os.environ)
    full_env.update(BENCH_SIZE)
    full_env.update(env)
    t0 = time.time()
    try:
        proc = subprocess.run(
            argv, cwd=ROOT, env=full_env, capture_output=True, text=True,
            timeout=timeout,
        )
        rc = proc.returncode
        out_tail = proc.stdout.strip().splitlines()[-5:]
        err_tail = proc.stderr.strip().splitlines()[-5:]
    except subprocess.TimeoutExpired as e:
        rc = -9
        # TimeoutExpired carries bytes even with text=True — decode or the
        # json.dumps below crashes the whole unattended queue.
        so = e.stdout or b""
        if isinstance(so, bytes):
            so = so.decode("utf-8", "replace")
        out_tail = so.strip().splitlines()[-5:]
        err_tail = ["TIMEOUT"]
    bench_json = None
    for line in out_tail:
        try:
            j = json.loads(line)
            if "metric" in j:
                bench_json = j
        except (ValueError, TypeError):
            continue
    rec = {
        "step": name,
        "env": env,
        "rc": rc,
        "elapsed_s": round(time.time() - t0, 1),
        "bench": bench_json,
        "stdout_tail": out_tail,
        "stderr_tail": err_tail,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    val = bench_json.get("value") if bench_json else None
    print(f"[queue] {name}: rc={rc} value={val} ({rec['elapsed_s']}s)", flush=True)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated step names")
    args = ap.parse_args(argv)

    if not tunnel_alive():
        print("[queue] tunnel relay DOWN (port 8082 refused) — aborting")
        return 1
    dead_zeros = 0
    for name, cmd, env, timeout in steps(args.quick):
        if args.only and name not in args.only.split(","):
            continue
        if not tunnel_alive():
            print("[queue] tunnel died before step", name, "— aborting")
            return 2
        rec = run_step(name, cmd, env, timeout)
        b = rec["bench"]
        if b is not None and b.get("value") == 0.0:
            dead_zeros += 1
            if dead_zeros >= 2 or not tunnel_alive():
                print("[queue] tunnel appears dead — aborting queue")
                return 2
        else:
            dead_zeros = 0
    print(f"[queue] done -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
