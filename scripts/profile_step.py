"""Profile one xVAPitch train step on the current backend and print the
top-k device time sinks (VERDICT r2 next-round #9).

Captures a jax.profiler trace around a few steady-state steps of the tiny
demo-sized v3 trainer, then parses the chrome-format trace
(``*.trace.json.gz``) that jax writes and aggregates device-lane op
durations by HLO op name. One command on the real chip:

    python scripts/profile_step.py [--outdir /tmp/xva_profile] [--iters 4]

Prints a JSON line: {"top": [[op, total_ms], ...], "total_ms": N}.
"""
import argparse
import glob
import gzip
import json
import os
import sys


def top_ops_from_trace(trace_dir: str, k: int = 15):
    """Aggregate complete-events by name across device lanes of the newest
    chrome trace under trace_dir."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        return None, None
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    # pid → process name; device lanes are named like "/device:TPU:0" or
    # contain "TPU"/"Device" (CPU runs label them differently — aggregate
    # everything that is not clearly a python/host thread)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    # Strictly device lanes only ("/device:TPU:0", "XLA Ops", …). Host
    # python lanes ("/host:...", thread names like "python3") dominate the
    # totals otherwise — the round-2 CPU smoke misattributed everything to
    # "$bench_train.py:155". If no device lane exists (pure-host trace),
    # return nothing rather than noise.
    device_pids = {p for p, n in pid_names.items()
                   if "/device:" in n or "XLA Ops" in n}
    if not device_pids:
        return None, None
    totals = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e["dur"] / 1000.0  # ms
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:k]
    return ranked, sum(totals.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/xva_profile")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model config (CPU smoke)")
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from xva_trainer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    from bench import probe_backend

    platform = probe_backend()
    print(f"[profile] backend: {platform}", file=sys.stderr)

    # use the bench_train xVAPitch step factory: same production train step
    import bench_train

    os.makedirs(args.outdir, exist_ok=True)
    kwargs = {"iters": args.iters}
    if args.tiny:
        kwargs = {"B": 4, "T_TEXT": 32, "T_SPEC": 64, "iters": args.iters}

    # prep ONCE (full-size tracing costs ~5 min of GIL-bound Python on this
    # host): warm-up run outside the trace, then trace steady-state
    t = bench_train.prep_xvapitch(**kwargs)
    t.compile()
    t.run()
    with jax.profiler.trace(args.outdir):
        result = t.run()
    ranked, total = top_ops_from_trace(args.outdir)
    out = {"platform": platform, "bench": result,
           "top": ranked, "total_ms": total}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
