"""Benchmark: MV-KPConv sphere inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: points/sec through the full flagship inference step — on-device
pyramid build (grid subsample + radius neighbors, replacing the reference's
CPU dataloader C++ ops), UNet-ResNet34 over num_views RGB-D frames,
on-device 2D→3D lifting, and the 5-level deeper KPConv encoder/decoder —
i.e. everything the reference does per test batch (dataloader worker + GPU
forward, test_models.py path).

Baseline: the reference publishes no throughput (BASELINE.md). We use an
estimated 1.0e5 points/sec for its Quadro P2000 pipeline: KPConv-PyTorch
forward ~0.2-0.4 s per ~35k-point batch on this class of GPU with the CPU
dataloader at ~10 workers feeding it (SURVEY.md §3.1 hot loops). Recorded in
BASELINE.json's north star as the 10× target denominator.
"""

import json
import os
import socket
import sys
import time

import numpy as np

# ---------------------------------------------------------------------------
# TPU-relay resilience (round-3 postmortem: BENCH_r03.json was rc=1 because
# the dev environment's axon relay — the tunnel to the one real chip — was
# down at the moment the driver ran this script, erasing the round's number).
# Policy: when the axon backend is requested, wait for the relay socket with
# backoff for a bounded window before touching jax (jax.devices() HANGS, not
# errors, while the relay is refusing connections), and if jax still raises
# UNAVAILABLE mid-run (relay died during the bench), re-exec this script
# until the same deadline. A transient outage thus degrades to a late
# number instead of rc=1; a persistent one still fails honestly.
# ---------------------------------------------------------------------------
_RELAY_ADDR = ("127.0.0.1", 8093)
_DEADLINE_ENV = "BENCH_RELAY_DEADLINE"  # absolute unix time, set on first run


def _relay_requested() -> bool:
    return "axon" in os.environ.get("JAX_PLATFORMS", "")


def _relay_up(timeout: float = 5.0) -> bool:
    try:
        with socket.create_connection(_RELAY_ADDR, timeout=timeout):
            return True
    except OSError:
        return False


def _deadline() -> float:
    if _DEADLINE_ENV not in os.environ:
        wait = float(os.environ.get("BENCH_RELAY_WAIT_S", "2700"))
        os.environ[_DEADLINE_ENV] = str(time.time() + wait)
    return float(os.environ[_DEADLINE_ENV])


def _wait_for_relay() -> None:
    """Block until the relay accepts TCP, or exit 1 past the deadline."""
    if not _relay_requested():
        return
    deadline = _deadline()
    delay = 10.0
    while not _relay_up():
        now = time.time()
        if now >= deadline:
            print(
                "bench.py: TPU relay 127.0.0.1:8093 unreachable for the whole "
                f"wait window (BENCH_RELAY_WAIT_S); giving up.",
                file=sys.stderr,
            )
            sys.exit(1)
        time.sleep(min(delay, max(1.0, deadline - now)))
        delay = min(delay * 1.5, 120.0)


def _retry_or_exit(err: BaseException) -> None:
    """On a relay UNAVAILABLE error: wait for the relay and re-exec."""
    msg = str(err)
    transient = "UNAVAILABLE" in msg or "Connection refused" in msg
    if not (transient and _relay_requested() and time.time() < _deadline()):
        raise err
    print(
        f"bench.py: transient backend failure ({msg.splitlines()[0][:120]}); "
        "waiting for relay and re-executing.",
        file=sys.stderr,
    )
    time.sleep(10.0)
    _wait_for_relay()
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


def main():
    import jax
    import jax.numpy as jnp

    from mvkpconv_tpu.models import MVKPConv
    from mvkpconv_tpu.ops.pyramid import build_pyramid
    from mvkpconv_tpu.training.config import KPConfig
    from mvkpconv_tpu.training.init import jit_init
    from __graft_entry__ import _make_batch

    cfg = KPConfig(
        fusion="early",
        in_features_dim=66,
        num_points=(16384, 4096, 1024, 256, 64),
        conv_neighbors=(30, 30, 30, 30, 30),
        pool_neighbors=(30, 30, 30, 30),
        num_views=5,
        image_height=120,
        image_width=160,
        batch_num=4,
        compute_dtype=jnp.bfloat16,
    )
    # A/B hook for the measurement queue: BENCH_OVERRIDES="k=v,k=v" applies
    # KPConfig field overrides (e.g. kpconv_tail=gform_dot) without touching
    # the default configuration the driver measures.
    if os.environ.get("BENCH_OVERRIDES"):
        import ast

        for ov in filter(None, os.environ["BENCH_OVERRIDES"].split(",")):
            k, v = ov.split("=", 1)
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            cfg = cfg.replace(**{k: v})
    b = cfg.batch_num
    model = MVKPConv(cfg)
    spec = cfg.pyramid_spec()
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in _make_batch(cfg, b, rng).items()}

    pyr0 = jax.jit(lambda p, m: build_pyramid(p, m, spec))(
        batch["points"], batch["mask"]
    )
    variables = jit_init(model, batch, pyr0)

    def infer(variables, batch):
        pyr = build_pyramid(batch["points"], batch["mask"], spec)
        logits = model.apply(variables, batch, pyr, train=False)
        return jnp.sum(logits)

    iters = 32

    @jax.jit
    def timed(variables, batch):
        # Run the whole timed loop inside one XLA program (the dev
        # environment reaches the TPU through a relay whose round-trip
        # latency would otherwise dominate per-call timings — measured
        # ~28 ms per synced dispatch, i.e. +3.5 ms/iter at iters=8, which
        # is why iters=32: the relay tax drops below 1 ms/iter), and CHAIN
        # the iterations: each step's input is perturbed by the previous
        # checksum, so XLA cannot hoist the loop-invariant body out of the
        # loop (LICM would otherwise run the step once regardless of the
        # trip count and inflate the result by `iters`×).
        def body(_, acc):
            bt = dict(batch)
            bt["points"] = batch["points"] + acc * 1e-20
            return acc + infer(variables, bt)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(timed(variables, batch))  # warmup / compile
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(timed(variables, batch))  # one dispatch, synced by the read
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters

    points_per_batch = b * cfg.num_points[0]
    value = points_per_batch / dt

    # Training-step throughput (forward + backward + clipped-SGD update +
    # BN-stat update, the trainer.py per-iteration program). The state
    # threads through the in-graph loop, so every iteration really executes
    # (each step's params differ — nothing for LICM to hoist).
    from mvkpconv_tpu.training.optim import make_optimizer
    from mvkpconv_tpu.training.steps import (
        create_train_state,
        make_apply_fn,
        make_train_step,
    )

    tx = make_optimizer(cfg, frozen_prefixes=("net_2d",))
    apply_fn = make_apply_fn(model, cfg, "mvkpconv")
    train_step = make_train_step(apply_fn, tx, cfg, donate=False)
    state0 = create_train_state(variables, tx)

    @jax.jit
    def timed_train(state, batch):
        def body(_, s):
            s, _metrics = train_step(s, batch)
            return s
        return jax.lax.fori_loop(0, iters, body, state)

    state1 = timed_train(state0, batch)  # warmup / compile
    jax.block_until_ready(state1)
    float(jnp.sum(state1.step))  # sync through the relay
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        sN = timed_train(state0, batch)
        float(jnp.sum(sN.step))
        ts.append(time.perf_counter() - t0)
    train_dt = min(ts) / iters
    train_rate = points_per_batch / train_dt

    # Host pipeline rate: real SphereDataset sampling (potential pick, frame
    # selection, feature assembly, padding) on synthetic scenes at bench
    # shapes. With the prefetch thread (data/prefetch.py) host and device
    # run concurrently, so sustained end-to-end throughput is the slower of
    # the two stages. (Dispatch timing through the dev relay would measure
    # the tunnel's ~0.5 s RTT, not the design — real deployments dispatch in
    # microseconds.)
    from mvkpconv_tpu.data import SphereDataset, synthetic

    scenes = []
    for i in range(2):
        scene = synthetic.make_scene(seed=i, num_points=120_000)
        scene.update(
            synthetic.render_views(
                scene, 12, cfg.image_height, cfg.image_width, seed=i
            )
        )
        scenes.append(scene)
    def host_rate_for(training: bool) -> float:
        ds = SphereDataset(scenes, cfg, training=training)
        ds.sample_batch()  # warm caches
        host_batches = 6
        t0 = time.perf_counter()
        for _ in range(host_batches):
            hb = ds.sample_batch()
        del hb
        host_dt = (time.perf_counter() - t0) / host_batches
        return points_per_batch / host_dt

    # inference host path AND the training host path (augmentation +
    # pose composition + color drop — the extra work training does), so the
    # "host ≫ device" claim covers the path that matters (round-2 VERDICT)
    host_rate = host_rate_for(training=False)
    host_rate_train = host_rate_for(training=True)
    sustained = min(value, host_rate)

    # MFU accounting: XLA's own cost analysis of the compiled inference
    # program (the principled FLOP count — includes UNet convs, KPConv
    # einsums, pyramid distance matmuls; model documented in RESULTS.md).
    # v5e bf16 peak: 394 TFLOP/s.
    try:
        cost = jax.jit(infer).lower(variables, batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0))
    except Exception:
        flops_per_step = 0.0
    peak = 394e12
    mfu = (flops_per_step / dt) / peak if flops_per_step else None

    baseline = 1.0e5  # estimated reference points/sec (see module docstring)
    print(
        json.dumps(
            {
                "metric": "mvkpconv_early_fusion_inference_points_per_sec",
                "value": round(value, 1),
                "unit": "points/sec/chip",
                "vs_baseline": round(value / baseline, 3),
                "host_pipeline_points_per_sec": round(host_rate, 1),
                "host_pipeline_train_points_per_sec": round(host_rate_train, 1),
                "host_inclusive_points_per_sec": round(sustained, 1),
                "train_points_per_sec": round(train_rate, 1),
                "flops_per_step": flops_per_step,
                "mfu": round(mfu, 5) if mfu is not None else None,
            }
        )
    )


if __name__ == "__main__":
    _wait_for_relay()
    try:
        main()
    except RuntimeError as e:
        _retry_or_exit(e)
