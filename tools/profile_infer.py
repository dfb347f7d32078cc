"""Profile the flagship inference hot path and summarize where time goes.

Runs the chunk-N prior sampler (the bench.py workload) under a
``jax.profiler`` trace, then parses the emitted Perfetto trace to print the
top-K ops by device time — the TPU counterpart of nvprof over the reference
hot loop (reference lib/core/function.py:124-146).

    python tools/profile_infer.py [--chunk 256] [--steps 3] [--top 25]
                                  [--trace-dir /tmp/vae2_profile]
"""

import argparse
import collections
import glob
import gzip
import json
import os

import _init_paths  # noqa: F401


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", default=256, type=int)
    ap.add_argument("--steps", default=3, type=int)
    ap.add_argument("--top", default=25, type=int)
    ap.add_argument("--trace-dir", default="/tmp/vae2_profile")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip the run; just summarize an existing trace")
    ap.add_argument("opts", nargs="*", default=[],
                    help="yacs-style KEY VALUE config overrides")
    return ap.parse_args()


def run_trace(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vae2_tpu.config import get_default_config
    from vae2_tpu.core.builder import build_system
    from vae2_tpu.core.infer_loop import make_prior_sampler

    cfg = get_default_config()
    cfg.merge_from_list(args.opts)
    system = build_system(cfg)
    h, w = 128, 256
    batch = {k: jnp.zeros((1, h, w, 9), jnp.float32)
             for k in ("xt", "x2t", "x3t")}
    state = system.init(jax.random.PRNGKey(0), batch)
    sampler = make_prior_sampler(system, chunk=args.chunk, height=h, width=w)
    xt = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (1, h, w, 9), np.uint8))
    x2t = jnp.asarray(np.random.RandomState(1).randint(
        0, 255, (1, h, w, 9), np.uint8))
    from vae2_tpu.utils.benchtime import fetch_sync

    rng = jax.random.PRNGKey(2)
    out = sampler(state, xt, x2t, rng)  # compile + warmup
    # block_until_ready does NOT wait for device execution under the axon
    # runtime — only a host fetch does (vae2_tpu/utils/benchtime.py), so the
    # trace window must close on fetch_sync or it captures nothing.
    fetch_sync(out)

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        rng, k = jax.random.split(rng)
        out = sampler(state, xt, x2t, k)
    fetch_sync(out)
    jax.profiler.stop_trace()
    print(f"trace written to {args.trace_dir}")


def summarize(trace_dir: str, top: int) -> None:
    """Aggregate device-track event durations from the Perfetto trace."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device tracks: process names containing TPU/device; fall back to all
    # complete ('X') events if the name heuristic finds nothing
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {p for p, n in pid_names.items()
                   if any(s in n.lower() for s in ("tpu", "device", "/device"))}

    def is_device(e):
        return not device_pids or e.get("pid") in device_pids

    totals = collections.Counter()
    counts = collections.Counter()
    total_dur = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e or not is_device(e):
            continue
        name = e.get("name", "?")
        totals[name] += e["dur"]
        counts[name] += 1
        total_dur += e["dur"]

    print(f"\ntop {top} device ops by total time "
          f"({total_dur / 1e3:.2f} ms traced):")
    print(f"{'us':>12} {'%':>6} {'count':>6}  op")
    for name, dur in totals.most_common(top):
        print(f"{dur:12.0f} {100 * dur / total_dur:6.2f} {counts[name]:6d}"
              f"  {name[:110]}")


def main():
    args = parse_args()
    if not args.parse_only:
        run_trace(args)
    summarize(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
