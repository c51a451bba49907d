#!/usr/bin/env python
"""Benchmark: VRCNet completion training throughput (points/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Protocol: the reference trains VRCNet on MVP with batch_size 32 x 2048-point
clouds (completion/cfgs/vrcnet.yaml); one train step = forward (dual-path,
batch internally doubles), 4-term chamfer loss, backward, Adam update. We
measure steady-state steps/sec on synthetic data (the dataset is RAM-resident
in the reference too, so input cost is negligible) and report
points/sec/chip = steps/sec * batch * 2048 / n_chips.

``vs_baseline``: the driver's north star is >=3x A100 points/sec/chip ON A
v5p (BASELINE.md). The reference publishes no throughput numbers, so we use
an estimated A100 VRCNet training throughput of 160 clouds/sec (~327,680
points/sec) for a single A100 on this workload; vs_baseline = value /
(3 * A100_EST) — i.e. vs_baseline >= 1.0 means the 3x target is met. The
estimate's derivation (a FLOP + bandwidth model of the reference's torch
stack) is in PERF.md §"A100 baseline derivation".

Hardware honesty: the artifact records which chip it actually ran on
(``chip``/``peak_flops_bf16``) and, when that chip is not a v5p, a
``vs_baseline_v5p`` projection with its scaling assumption spelled out in
``v5p_projection_assumption`` — the measured number and the target's chip
are not silently conflated.

MFU honesty: ``mfu`` uses XLA's compiled cost analysis, which counts the
one-hot gather/scatter MXU matmuls (O(M*N*C) flops doing O(M*C) data
movement) as arithmetic. ``mfu_useful`` subtracts those synthetic flops
(collected at trace time by ops.pallas_kernels.flop_audit) and adds back the
ops' logical work, so it reflects useful math only. Both are reported.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_EST_POINTS_PER_SEC = 160 * 2048  # see PERF.md "A100 baseline derivation"
TARGET = 3 * A100_EST_POINTS_PER_SEC

NUM_POINTS = 2048
WARMUP = 3
STEPS = 30

# Known TPU generations: device_kind substring -> (name, bf16 peak flops/s,
# HBM bytes/s). Sources: public TPU system architecture tables.
CHIPS = (
    ("v5 lite", "v5e", 197e12, 819e9),
    ("v5litepod", "v5e", 197e12, 819e9),
    ("v5p", "v5p", 459e12, 2765e9),
    ("v6 lite", "v6e", 918e12, 1640e9),
    ("v6e", "v6e", 918e12, 1640e9),
    ("v4", "v4", 275e12, 1228e9),
)
V5P_PEAK, V5P_HBM = 459e12, 2765e9

# Per-component v5p projection (PERF.md "v5p projection derivation").
# Fractions of the VRCNet step by BINDING RESOURCE, from the round's closing
# source-exact attribution (tools/profile_step.py); update when the
# attribution shifts. Scales: v5p/v5e peak-flops ratio for MXU-bound rows,
# HBM-bandwidth ratio for stream-bound rows, ~1.3x (clock + issue width)
# for VPU- and latency-bound rows. Each row scales by ITS binding resource,
# unlike the min-ratio whole-step scaling, which is only an upper bound.
V5E_STEP_FRACTIONS = {  # r5 close, 136.7 ms device-attributed step (PERF.md
    # "Round-5 source-exact VRCNet attribution")
    "mxu": 0.611,   # SA one-hot f+b 44.4, chamfer bwd 10.5, GEMMs 8.2,
                    # group_max 11.3, ti+gathers 7.6, ball_query 1.6
    "vpu": 0.240,   # kNN distance planes 23.6, chamfer fwd planes 9.2
    "latency": 0.142,  # FPS 8.2 (serial greedy) + glue/copies ~11
    "hbm": 0.007,   # bias adds / storage-dtype epilogues 0.9
}
V5P_COMPONENT_SCALE = {"mxu": 459 / 197, "vpu": 1.3, "latency": 1.3,
                       "hbm": 2765 / 819}


def chip_info():
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "") or str(dev)
    for pat, name, peak, hbm in CHIPS:
        if pat in kind.lower():
            return kind, name, peak, hbm
    # Unknown chip: assume v5e numbers (the conservative ones) and say so.
    return kind, "unknown(assumed v5e)", 197e12, 819e9


def build(batch_size):
    import os

    from mvp_benchmark_tpu.models import get_model
    from mvp_benchmark_tpu.train import engine
    from mvp_benchmark_tpu.train.config import Config

    cfg = Config(
        model_name="vrcnet", num_points=NUM_POINTS, loss="cd",
        eval_emd=False, lr=1e-4, optimizer="Adam", betas="0.9, 0.999",
        weight_decay=0, layers="1, 1, 1, 1", knn_list="16",
        distribution_loss="KLD", pk=10, local_folding=True,
        points_label=True, num_coarse_raw=1024, num_fps=2048,
        num_coarse=2048, batch_size=batch_size, manual_seed=1,
        # bf16 activations (fp32 params/optimizer/coordinate heads) is the
        # TPU-native training mode; BENCH_DTYPE=float32 for the ablation.
        compute_dtype=os.environ.get("BENCH_DTYPE", "bf16"),
    )
    engine.apply_compute_dtype(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch_size, NUM_POINTS, 3), np.float32))
    gt = jnp.asarray(rng.random((batch_size, NUM_POINTS, 3), np.float32))

    model = get_model("vrcnet", cfg)
    ctx = engine.create_context(cfg, model, (x, gt))
    step = engine.make_train_step(model, ctx.tx, "completion")
    return step, ctx, {"inputs": x, "gt": gt}


def step_flops(step, ctx, batch, alpha):
    """(xla_flops, synthetic_flops, useful_flops) per step.

    xla_flops: XLA's compiled cost analysis (includes the Pallas kernels'
    cost estimates — i.e. the one-hot bookkeeping matmuls). synthetic/useful:
    trace-time audit of exactly those one-hot kernels (flop_audit docstring).
    """
    from mvp_benchmark_tpu.ops import pallas_kernels

    try:
        with pallas_kernels.flop_audit() as audit:
            lowered = step.lower(
                ctx.params, ctx.batch_stats, ctx.opt_state, dict(batch),
                alpha, jax.random.PRNGKey(0),
            )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)), audit["synthetic"],
                audit["useful"])
    except Exception:
        return 0.0, 0.0, 0.0


def mxu_probe():
    """Measured bf16 matmul rate (TFLOP/s) on the bench chip RIGHT NOW.

    The tunnel chip is intermittently shared with other tenants (observed:
    a pure matmul at 20 then 3.6 TFLOP/s vs the 197 peak, inflating step
    times ~2-50x). The artifact must not present a contended-window number
    as the framework's throughput without saying so. The contention policy
    (probe >= 0.5 * peak == clean) lives in wait_for_quiet_chip."""
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return None  # CPU smoke run: the probe itself would dominate
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda x: (x @ a).astype(jnp.bfloat16))
    r = f(a)
    float(r[0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(r)
    float(r[0, 0])  # true sync through the tunnel
    dt = (time.perf_counter() - t0) / 10
    return 2 * n**3 / dt / 1e12


def wait_for_quiet_chip(peak, max_attempts=8, sleep_s=75):
    """Probe-gated wait: re-probe until the chip is quiet or attempts run out.

    Returns (probes, contended). ``probes`` records EVERY probe value so the
    artifact shows the whole session's contention history, not one sample.
    Clean == probe >= 50% of datasheet bf16 peak. Bounded at
    max_attempts * sleep_s (~10 min default) so the driver's bench run
    terminates even on a permanently shared chip."""
    probes = []
    for attempt in range(max_attempts):
        p = mxu_probe()
        if p is None:
            return probes, False  # CPU smoke: no contention concept
        probes.append(round(p, 1))
        if p >= 0.5 * peak / 1e12:
            return probes, False
        if attempt < max_attempts - 1:
            time.sleep(sleep_s)
    return probes, True


def run(batch_size, windows=1):
    step, ctx, batch = build(batch_size)
    alpha = jnp.asarray(0.5)
    flops, syn, useful = step_flops(step, ctx, batch, alpha)
    params, bs, opt = ctx.params, ctx.batch_stats, ctx.opt_state
    rng = jax.random.PRNGKey(0)

    for _ in range(WARMUP):
        rng, r = jax.random.split(rng)
        params, bs, opt, aux = step(params, bs, opt, dict(batch), alpha, r)
        float(aux["total_loss"])  # force full per-step sync

    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            rng, r = jax.random.split(rng)
            params, bs, opt, aux = step(params, bs, opt, dict(batch),
                                        alpha, r)
        # One full host sync at the end: step i+1 consumes step i's params,
        # so the final loss transitively forces every step.
        # (block_until_ready is not a true sync through the remote tunnel,
        # but a scalar device->host pull is; a per-step pull would add a
        # tunnel round-trip per step — ~100 ms of pure latency on fast
        # models.)
        float(aux["total_loss"])
        dt = time.perf_counter() - t0
        best = max(best, STEPS / dt)
    return best, flops, syn, useful


def per_model_table():
    """Chained-sync ms/step for the five non-flagship models (VRCNet is the
    headline measurement above). Regression guard: ECG's round-1 'never
    actually compiled at reference scale' went unnoticed for a full round
    because only VRCNet was machine-benchmarked. BENCH_PER_MODEL=0 skips."""
    import os

    if os.environ.get("BENCH_PER_MODEL", "1") == "0":
        return {}
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    try:
        import tpu_step_check
    except Exception:
        return {}
    table = {}
    for name in ("pcn", "ecg", "dcp", "deepgmr", "idam"):
        try:
            r = tpu_step_check.check(name, batch_size=32, steps=10)
            table[name] = round(r["ms_per_step"], 1)
        except Exception as e:
            table[name] = f"failed: {str(e)[:80]}"
    return table


def main():
    n_chips = max(jax.device_count(), 1)
    kind, chip, peak, hbm = chip_info()
    # Probe-gated quiet window: re-probe (bounded) until the chip is quiet
    # rather than timing under known contention. Every probe is recorded.
    probes, contended = wait_for_quiet_chip(peak)
    probe = probes[-1] if probes else None
    err = None
    for batch_size in (32, 16, 8):
        try:
            # If the chip never went quiet, take the best of 3 measurement
            # windows (the least-contaminated one) and flag the artifact.
            sps, flops, syn, useful = run(
                batch_size, windows=3 if contended else 1
            )
            probe_after = mxu_probe()  # detect mid-run contention onset
            pps = sps * batch_size * NUM_POINTS / n_chips
            # MFU over the bench chip's bf16 peak (the precision every
            # matmul actually runs at; XLA DEFAULT rounds inputs to bf16).
            mfu = sps * flops / (peak * n_chips)
            mfu_useful = sps * max(flops - syn + useful, 0.0) / (peak * n_chips)
            models_ms = per_model_table()
            models_ms["vrcnet"] = round(1e3 / sps, 1)
            out = {
                "metric": "vrcnet_train_points_per_sec_per_chip",
                "value": round(pps, 1),
                "unit": f"points/sec/chip (bs={batch_size}, n={NUM_POINTS})",
                "vs_baseline": round(pps / TARGET, 4),
                "chip": kind,
                "chip_model": chip,
                "peak_flops_bf16": peak,
                "mfu": round(mfu, 4),
                "mfu_useful": round(mfu_useful, 4),
                "flops_per_step_xla": flops,
                "flops_per_step_synthetic_onehot": syn,
                "ms_per_step": round(1e3 / sps, 1),
                "models_ms_per_step": models_ms,
            }
            if probe is not None:
                out["mxu_probe_tflops"] = round(probe, 1)
                out["mxu_probes_all_tflops"] = probes
                if probe_after is not None:
                    out["mxu_probe_after_tflops"] = round(probe_after, 1)
                    if (not contended
                            and probe_after < 0.5 * peak / 1e12):
                        out["chip_contended_midrun"] = True
                out["chip_contended"] = bool(contended)
                if contended:
                    out["contention_note"] = (
                        "pure-matmul probe stayed below 50% of the "
                        f"{peak / 1e12:.0f} TFLOP/s peak across "
                        f"{len(probes)} probes over ~10 min "
                        f"(values: {probes}) — the tunnel chip was shared "
                        "for the whole bench session; ms_per_step is "
                        "inflated accordingly (best of 3 windows reported)"
                    )
            if chip != "v5p":
                # The north-star target is defined on v5p hardware. Primary
                # projection: scale each component CLASS of the measured
                # step by its binding resource's v5p/v5e ratio (fractions
                # from the closing source-exact attribution — see
                # V5E_STEP_FRACTIONS). The min(peak, hbm) whole-step
                # scaling is kept only as an explicit UPPER BOUND: it
                # assumes even latency-bound components speed up 2.33x.
                t_scale = sum(
                    V5E_STEP_FRACTIONS[k] / V5P_COMPONENT_SCALE[k]
                    for k in V5E_STEP_FRACTIONS
                )  # v5p step time as a fraction of the measured step
                out["vs_baseline_v5p"] = round(pps / t_scale / TARGET, 4)
                out["v5p_projection_assumption"] = (
                    f"measured on {chip}; per-component projection — each "
                    "attribution class scaled by its binding resource "
                    f"(MXU x{V5P_COMPONENT_SCALE['mxu']:.2f}, HBM "
                    f"x{V5P_COMPONENT_SCALE['hbm']:.2f}, VPU/latency "
                    f"x1.3), fractions from PERF.md closing attribution"
                )
                ub_scale = min(V5P_PEAK / peak, V5P_HBM / hbm)
                out["vs_baseline_v5p_upper_bound"] = round(
                    pps * ub_scale / TARGET, 4)
            print(json.dumps(out))
            return
        except Exception as e:  # OOM etc. -> retry smaller batch
            err = e
            continue
    print(json.dumps({
        "metric": "vrcnet_train_points_per_sec_per_chip",
        "value": 0.0,
        "unit": "points/sec/chip",
        "vs_baseline": 0.0,
        "error": str(err)[:200],
    }))
    sys.exit(1)


if __name__ == "__main__":
    main()
