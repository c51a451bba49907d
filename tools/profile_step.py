#!/usr/bin/env python
"""Per-op device-time attribution for one model's train step.

Runs N jitted train steps under jax.profiler.trace and aggregates TPU-lane
event durations by op name prefix, printing a sorted table in ms/step.
This is the ground truth behind PERF.md's device-time breakdowns (wall time
through the axon tunnel includes ~20 ms of dispatch latency; see
axon-tpu-gotchas).

Usage: python tools/profile_step.py [model] [steps]
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ".")

import tpu_step_check  # noqa: E402

from mvp_benchmark_tpu.models import get_model  # noqa: E402
from mvp_benchmark_tpu.train import engine  # noqa: E402


def profile(name: str, steps: int = 5, batch_size: int = 32):
    cfg = (tpu_step_check.COMPLETION.get(name)
           or tpu_step_check.REGISTRATION[name])
    if os.environ.get("BENCH_DTYPE"):
        from mvp_benchmark_tpu.train.config import Config
        cfg = Config(**{**cfg, "compute_dtype": os.environ["BENCH_DTYPE"]})
    engine.apply_compute_dtype(cfg)
    kind = "completion" if name in tpu_step_check.COMPLETION else "registration"
    model = get_model(name, cfg)
    rng = np.random.default_rng(0)
    N = tpu_step_check.N
    if kind == "completion":
        x = jnp.asarray(rng.random((batch_size, N, 3), np.float32))
        gt = jnp.asarray(rng.random((batch_size, N, 3), np.float32))
        args, batch = (x, gt), {"inputs": x, "gt": gt}
    else:
        src = jnp.asarray(rng.random((batch_size, N, 3), np.float32))
        tgt = jnp.asarray(rng.random((batch_size, N, 3), np.float32))
        T = jnp.tile(jnp.eye(4), (batch_size, 1, 1))
        args, batch = (src, tgt, T), {"src": src, "tgt": tgt, "transform": T}

    ctx = engine.create_context(cfg, model, args)
    step = engine.make_train_step(model, ctx.tx, kind)
    params, bs, opt = ctx.params, ctx.batch_stats, ctx.opt_state
    key = jax.random.PRNGKey(0)
    # Warmup / compile.
    for _ in range(2):
        key, k = jax.random.split(key)
        params, bs, opt, aux = step(params, bs, opt, batch, jnp.asarray(0.5), k)
    float(aux["total_loss"])

    tmp = tempfile.mkdtemp(prefix=f"trace_{name}_")
    with jax.profiler.trace(tmp):
        for _ in range(steps):
            key, k = jax.random.split(key)
            params, bs, opt, aux = step(params, bs, opt, batch,
                                        jnp.asarray(0.5), k)
        float(aux["total_loss"])
    if os.environ.get("PROFILE_BY_SOURCE", "1") != "0":
        return summarize_by_source(tmp, steps)
    return summarize(tmp, steps)


def summarize_by_source(trace_dir: str, steps: int, top: int = 36):
    """Source-line-exact attribution: aggregate device-lane XLA op events by
    args['source'] (custom-VJP backward ops inherit the PRIMAL call site).
    Step-span regions (jit_step parents and their numeric child spans) are
    excluded — they tile the whole step and would double-count it."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print(f"no trace files under {trace_dir}")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "/device" in pname.lower():
                pids.add(e["pid"])
    agg, cnt, total = collections.Counter(), collections.Counter(), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_step(") or name.isdigit():
            continue
        args = e.get("args", {}) or {}
        src = args.get("source") or args.get("source_info")
        key = src if src else ("<nosrc> " + name.split(".")[0])
        agg[key] += e.get("dur", 0) / 1e3
        cnt[key] += 1
        total += e.get("dur", 0) / 1e3
    print(f"# attributed device: {total / steps:.1f} ms/step")
    for k, ms in agg.most_common(top):
        print(f"{ms / steps:8.2f} ms  {cnt[k] // steps:4d}/step  {k}")
    print(f"(trace dir kept: {trace_dir})")


def summarize(trace_dir: str, steps: int, top: int = 40):
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print(f"no trace files under {trace_dir}")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Find TPU/device lanes: process names containing 'TPU' or '/device:'.
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "/device" in pname.lower():
                pids.add(e["pid"])
    agg = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        # Collapse fusion suffixes: 'fusion.123' -> 'fusion', keep custom
        # call names (Pallas kernels) intact.
        base = name.split(".")[0]
        agg[base] += dur
        total += dur
    print(f"# device time: {total / steps:.1f} ms/step over {steps} steps "
          f"({len(pids)} device lanes)")
    for name, ms in agg.most_common(top):
        print(f"{ms / steps:9.2f} ms  {100 * ms / total:5.1f}%  {name}")
    print(f"(trace dir kept: {trace_dir})")


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "vrcnet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    os.environ.setdefault("BENCH_DTYPE", "bf16" if model == "vrcnet" else "")
    profile(model, n)
