"""Benchmark: flagship encoder forward throughput on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Primary metric (BASELINE.json): FSC utterances/sec/chip on the encoder
forward (sinc front-end + 4 stacked bi-GRU stages, default no_unfreezing
topology, B=64, 4 s utterances @16 kHz). Timing is amortized over queued
iterations with a device->host sync at the end — per-call wall time through
the axon relay is dominated by ~70 ms RPC latency that a production input
pipeline (queued steps) never pays.

``vs_baseline`` compares against the reference PyTorch implementation's
encoder forward measured on this machine's CPU (the only hardware the
reference can run on here): 90.8 utt/s (B=16, torch 2.13 CPU, measured
2026-08-16 via the functional torch oracle in tests/test_models.py; remeasure
with --measure-baseline). The reference repo publishes no GPU throughput
numbers (SURVEY.md §6).

Deadline discipline (round 5): the whole run operates under a global
wall-clock budget (TPU_SLU_BENCH_BUDGET_S, default 780 s) so the driver's
one-shot invocation can NEVER lose the record to a timeout again
(BENCH_r04 was rc=124 with no JSON line). The primary metric is measured
first; every other section is gated on the remaining budget (skipped
sections report "skipped_budget"), per-section compile/wall seconds land in
the record, and a watchdog thread + SIGALRM backstop print the partial
record and exit 0 if the main flow is still blocked (e.g. a 10-minute
remote compile) when the budget expires.

Extra fields (informational, not part of the contract): relay-wall p50
decode latency and the scan-vs-pallas GRU implementation used. The promoted
latency headline is ``p50_decode_device_ms`` plus the committed serving-path
warm percentiles (VERDICT r4 #5).
"""

import argparse
import json
import os
import signal
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

TORCH_CPU_BASELINE_UTT_S = 90.8  # see module docstring


V5E_HBM_GBPS = 819.0  # TPU v5e HBM bandwidth
# Measured chip unit rates (tools/bench_vpu.py, v5e, 2026-08-17): sustained
# dependent-chain throughputs on THIS chip, not spec-sheet peaks. The MXU
# number is the v5e bf16 spec peak; the kernels keep matmul operands bf16
# (f32 accumulation) so it is the relevant ceiling.
V5E_MXU_BF16_TFLOPS = 197.0
V5E_VPU_TANH_TELEM_S = 1.6   # tanh/exp transcendental elements per second
V5E_VPU_ELEM_TOPS = 3.3      # plain elementwise (fma-class) ops per second


def min_encoder_hbm_bytes(arch, batch: int, t_samples: int) -> int:
    """*Lower-bound* HBM traffic of one encoder forward (bytes, f32).

    Implementation-independent floor, so the reported roofline fraction is a
    true <= 1.0 fraction of the physical bandwidth ceiling: every layer
    boundary tensor is written once by its producer and read once by its
    consumer, and nothing else moves. Elementwise ops and pools fuse into
    their producers/consumers (the producer writes the already-pooled size),
    and the GRU gate streams cost NOTHING: the fused Pallas kernels compute
    the input projection in-kernel from the streamed layer input, so the
    (B, T, 3H) gate tensors never touch HBM (ops/pallas_gru.py). Weights
    (3.7 M params, VMEM-resident) are ignored, as is anything a sufficiently
    smart compiler could keep on-chip beyond this. The real kernels move
    somewhat more (the bidirectional input is streamed once per direction,
    plus one flipped copy), so achieved/roofline stays conservatively < 1.
    """
    f32 = 4
    total = 0
    t, c = t_samples, 1
    # pending=True: the current input tensor is an unmaterialized producer
    # output (its write is charged when consumed, at the then-current,
    # post-fused-pool size). pending=False: input already written (the
    # waveform, or GRU outputs charged at the GRU), charge only the read.
    pending = False

    def consume():
        nonlocal total, pending
        total += (2 if pending else 1) * batch * t * c * f32
        pending = False

    for spec in list(arch.phoneme_layers) + list(arch.word_layers):
        if spec.kind in ("sinc", "conv"):
            if spec.kind == "sinc":
                cout, k, _, stride, pad = spec.h
            else:
                _, cout, k, stride, pad = spec.h
            consume()
            t = (t + 2 * pad - k) // stride + 1
            c = cout
            pending = True
        elif spec.kind == "pool":
            t = -(-t // spec.h[0])  # fused into the producer's write
        elif spec.kind == "downsample":
            if spec.h[1] > 1:
                t = -(-t // spec.h[1])  # fused into the consumer's read
        elif spec.kind == "gru":
            consume()
            _, hidden, bidir = spec.h
            dirs = 2 if bidir else 1
            total += batch * t * hidden * dirs * f32  # outputs written once
            c = hidden * dirs
    return total


def encoder_unit_floors_us(arch, batch: int, t_samples: int) -> dict:
    """Analytic per-unit lower bounds (microseconds) for one encoder forward.

    Complements the HBM byte model with the other two hardware units so the
    bench can report a *combined* speed-of-light fraction: the forward is
    VPU/issue-bound, not bandwidth-bound (docs/KERNELS.md), and the HBM-only
    roofline under-states the true ceiling. Each floor is optimistic
    (undercounts its unit's work), so max(floors) <= any achievable time:

    - mxu: 2*M*N*K flops of every conv and GRU matmul at the bf16 spec peak.
    - vpu: the GRU gate chain only — 3H tanh-unit elements per step per
      direction (fused r|z sigmoid and the n tanh both evaluate via the tanh
      unit) plus ~12H fma-class elementwise ops (gi+gh adds, sigmoid affine,
      r*gh, the n+z*(h-n) update, carry select) at the measured chain rates.
      Conv-side elementwise (abs, pool) is ignored.
    """
    flops = 0.0
    tanh_elems = 0.0
    elem_ops = 0.0
    t, c = t_samples, 1
    for spec in list(arch.phoneme_layers) + list(arch.word_layers):
        if spec.kind in ("sinc", "conv"):
            if spec.kind == "sinc":
                cout, k, _, stride, pad = spec.h
                cin = c
            else:
                cin, cout, k, stride, pad = spec.h
            t = (t + 2 * pad - k) // stride + 1
            flops += 2.0 * batch * t * cout * cin * k
            c = cout
        elif spec.kind == "pool":
            t = -(-t // spec.h[0])
        elif spec.kind == "downsample":
            if spec.h[1] > 1:
                t = -(-t // spec.h[1])
        elif spec.kind == "gru":
            _, hidden, bidir = spec.h
            dirs = 2 if bidir else 1
            flops += 2.0 * batch * t * dirs * (c + hidden) * 3 * hidden
            tanh_elems += batch * t * dirs * 3 * hidden
            elem_ops += batch * t * dirs * 12 * hidden
            c = hidden * dirs
    hbm_us = min_encoder_hbm_bytes(arch, batch, t_samples) / (V5E_HBM_GBPS * 1e9) * 1e6
    mxu_us = flops / (V5E_MXU_BF16_TFLOPS * 1e12) * 1e6
    vpu_us = (tanh_elems / (V5E_VPU_TANH_TELEM_S * 1e12)
              + elem_ops / (V5E_VPU_ELEM_TOPS * 1e12)) * 1e6
    return {"hbm": hbm_us, "mxu": mxu_us, "vpu": vpu_us}


def robust_slope(run, iters: int, outer: int = 3, budget_s: float = 0.0,
                 min_s: float = 0.0, patience: int = 0, tol: float = 0.02,
                 spacing_s: float = 0.0, sleep=time.sleep, clock=time.time):
    """Best sane two-point slope estimate of per-iteration device time.

    ``run(k)`` executes k queued iterations + one sync and returns wall time.
    The relay's RPC latency occasionally SPIKES during the 1-iteration
    baseline, making tk - t1 vanish (or go negative) and the naive estimate
    absurd; an estimate only counts if the slope term dominates the
    intercept (tk - t1 > 0.2 * tk). If every round is degenerate, fall back
    to the conservative upper bound tk / (iters + 1) (includes the RPC).

    Returns ``(seconds_per_iter, fallback_used)``.

    Two modes:

    * ``budget_s == 0`` (default): exactly ``outer`` rounds, best estimate.
    * ``budget_s > 0`` — *measure-until-converged*, for the one-shot driver
      run: chip/relay throughput swings ±40% across minutes (CLAUDE.md), so
      a short burst of rounds can land entirely inside a bad window and
      record a number ~2x worse than the same code minutes later
      (BENCH_r02: 0.747 ms vs same-code 0.433). Rounds repeat, spaced
      ``spacing_s`` apart, until (a) at least ``min_s`` seconds have elapsed
      AND (b) the best estimate hasn't improved by more than ``tol`` for
      ``patience`` consecutive rounds — or ``budget_s`` runs out. The time
      spread is the point: it gives the measurement a chance to catch a
      good window regardless of when the driver happens to invoke it.
    """
    estimates, fallbacks = [], []
    best = float("inf")
    stale = 0
    t_start = clock()
    rounds = 0
    while True:
        t1 = min(run(1) for _ in range(3))
        tk = min(run(iters + 1) for _ in range(2))
        fallbacks.append(tk / (iters + 1))
        prev_best = best
        if tk - t1 > 0.2 * tk:
            estimates.append((tk - t1) / iters)
            best = min(best, estimates[-1])
        rounds += 1
        if budget_s <= 0:
            if rounds >= outer:
                break
        else:
            elapsed = clock() - t_start
            stale = stale + 1 if best > (1.0 - tol) * prev_best else 0
            if elapsed >= budget_s:
                break
            if elapsed >= min_s and estimates and stale >= patience:
                break
            if spacing_s > 0:
                sleep(spacing_s)
    if estimates:
        # Report the SECOND-smallest estimate when enough rounds exist: a
        # round that straddles a slow->fast window transition pairs an
        # inflated t1 with a fast tk and reports an optimistic slope, and a
        # plain min would select exactly that round. A genuine good window
        # lasts minutes and yields many agreeing rounds, so corroboration
        # costs nothing.
        ranked = sorted(estimates)
        return (ranked[1] if len(ranked) >= 4 else ranked[0]), False
    return min(fallbacks), True


def measure_torch_baseline(batch=16, seconds=4.0):
    import torch

    sys.path.insert(0, __file__.rsplit("/", 1)[0] + "/tests")
    import __graft_entry__
    from test_models import torch_encoder_features
    from tpu_slu.models.slu import Model
    from tpu_slu.models.torch_import import export_pretrained_state_dict

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    state = export_pretrained_state_dict(model.params["pretrained_model"], model.encoder_arch)
    x = np.random.default_rng(0).standard_normal((batch, int(seconds * 16000))).astype(np.float32)
    with torch.no_grad():
        torch_encoder_features(state, config, x)
        t0 = time.time()
        n = 3
        for _ in range(n):
            torch_encoder_features(state, config, x)
        dt = time.time() - t0
    return batch * n / dt


BUDGET_DEFAULT_S = 780.0  # keep inside a `timeout 900` driver run with headroom


def main():
    parser = argparse.ArgumentParser()
    # 128 is the headline batch: utt/s grows with rows (the recurrence is
    # latency-bound) and 128 keeps the fwd executable ~0.5 MB. 256 measures
    # slightly faster in good windows but its executable serializes to 30 MB,
    # which takes ~10 min to load through the dev relay on every process
    # start — cache hit or not.
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--seconds", type=float, default=4.0)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--gru-impl", default="auto",
                        help="auto | scan | pallas | pallas:<time_block>")
    parser.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    parser.add_argument("--measure-baseline", action="store_true")
    parser.add_argument("--force-platform", default="",
                        help="pin jax_platforms (e.g. cpu) — env vars are too "
                             "late, a sitecustomize imports jax first")
    args = parser.parse_args()

    # ---- deadline discipline (BENCH_r04 was lost to rc=124: the driver's
    # timeout killed the process before the contract line printed). EVERYTHING
    # below runs under a global wall-clock budget: sections are attempted
    # primary-metric-first, each is skipped (marked "skipped_budget") when the
    # remaining budget can't cover its worst-case cold-compile cost, and a
    # watchdog thread + SIGALRM backstop dump whatever has been measured if
    # the main flow is still blocked (e.g. inside a 10-minute remote compile)
    # when the budget expires. The contract line ALWAYS prints.
    t_start = time.time()
    budget_s = float(os.environ.get("TPU_SLU_BENCH_BUDGET_S", str(BUDGET_DEFAULT_S)))
    deadline = t_start + budget_s

    def remaining():
        return deadline - time.time()

    sections = {}
    skipped = "skipped_budget"
    record = {
        "metric": "fsc_encoder_fwd_utterances_per_sec_per_chip",
        "value": None,
        "unit": "utt/s/chip (B=%d, %gs audio)" % (args.batch, args.seconds),
        "vs_baseline": None,
        "baseline": "reference torch-CPU encoder fwd %.1f utt/s" % TORCH_CPU_BASELINE_UTT_S,
        "hbm_roofline_frac": None,
        "achieved_gbps": None,
        "sol_frac": None,
        "sol_frac_device": skipped,
        "dispatch_us": skipped,
        "device_us_scan8": skipped,
        "unit_floors_us": None,
        # Headline latency fields (VERDICT r4 #5): the DEVICE decode time and
        # the committed serving-path warm percentiles are what a production
        # deployment sees; the relay-wall p50 (p50_decode_ms) is kept as an
        # informational field because it mostly measures this dev harness's
        # ~70 ms host->relay RPC, not the chip.
        "p50_decode_device_ms": skipped,
        "p50_decode_ms": skipped,
        "decode_device_ms": skipped,
        "train_step_ms": skipped,
        "train_step_batch": 64,
        "seq2seq_beam_ms": skipped,
        "seq2seq_beam_batch": 16,
        "asr_step_ms": skipped,
        "asr_step_batch": 64,
        "seq2seq_train_ms": skipped,
        "seq2seq_train_batch": 64,
        "asr_5s_smoke": skipped,
        "gru_impl": None,
        "dtype": args.dtype,
        "ms_per_iter_device": None,
        "compile_s": None,
        "backend": None,
        "budget_s": budget_s,
        "phase": "init",
        "sections": sections,
    }
    # Serving-path warm latency from the committed load-test artifact
    # (experiments/serving_v5e.json, measured on this chip): the number the
    # BASELINE.json "p50 decode_intents latency" target maps to in production.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "experiments", "serving_v5e.json")) as f:
            serving = json.load(f)
        record["serving_warm_p50_ms"] = serving.get("serial_p50_ms")
        record["serving_warm_p99_ms"] = serving.get("serial_p99_ms")
        record["serving_source"] = "experiments/serving_v5e.json (recorded load test)"
    except Exception:
        pass

    emit_lock = threading.Lock()
    emitted = threading.Event()
    fallback_metrics = []

    def emit():
        with emit_lock:
            if emitted.is_set():
                return
            record["wall_s"] = round(time.time() - t_start, 1)
            if fallback_metrics:
                # One or more slopes had no sane estimate and fell back to
                # the tk/(k+1) upper bound (includes the RPC intercept) —
                # those numbers are pessimistic, not measurements (ADVICE r2).
                record["slope_fallback"] = list(fallback_metrics)
            sys.stdout.write(json.dumps(record) + "\n")
            sys.stdout.flush()
            emitted.set()

    def watchdog():
        # If the main flow is still blocked (remote compile, relay hang) when
        # the budget expires, dump what exists and hard-exit: a partial record
        # beats rc=124 with no record at all.
        while not emitted.is_set():
            left = (deadline + 10.0) - time.time()
            if left <= 0.0:
                record["watchdog_fired"] = True
                cur = record.get("phase")
                if isinstance(sections.get(cur), dict) and "status" not in sections[cur]:
                    sections[cur]["status"] = "interrupted_budget"
                emit()
                os._exit(0)
            emitted.wait(min(left, 5.0))

    threading.Thread(target=watchdog, daemon=True).start()
    try:
        def _alarm(*_):
            record["alarm_fired"] = True
            emit()
            os._exit(0)

        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(int(budget_s) + 25)
        # `timeout N python bench.py` delivers SIGTERM at an UNKNOWN driver
        # deadline (possibly < our budget). The driver parses the stdout
        # tail even on rc=124, so emitting on SIGTERM preserves the record.
        def _term(*_):
            record["sigterm_emitted"] = True
            emit()
            os._exit(0)

        signal.signal(signal.SIGTERM, _term)
    except (ValueError, OSError):
        pass  # no signals here (platform/thread); the watchdog still covers us

    import jax
    import jax.numpy as jnp

    if args.force_platform:
        jax.config.update("jax_platforms", args.force_platform)

    jax.config.update("jax_compilation_cache_dir", __file__.rsplit("/", 1)[0] + "/.jax_cache")

    # The axon relay goes UNAVAILABLE for stretches (observed 2026-08-17: one
    # backend-init attempt hung ~50 min before failing). Ride out transient
    # windows but stay inside the global budget: if the backend never comes
    # up, print the contract line with an error marker instead of dying.
    record["phase"] = "backend_init"
    init_deadline = min(deadline - 60.0, t_start + 15 * 60)
    attempt = 0
    while True:
        attempt += 1
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if time.time() >= init_deadline:
                record["error"] = f"backend init failed within budget: {e}"
                emit()
                return
            print(f"backend init failed (attempt {attempt}): {e}; "
                  "retrying in 60 s", file=sys.stderr, flush=True)
            try:
                import jax.extend.backend
                jax.extend.backend.clear_backends()  # init failures are cached
            except Exception:
                pass
            time.sleep(60)

    import __graft_entry__
    from tpu_slu.models import encoder as enc
    from tpu_slu.models import slu as slu_mod
    from tpu_slu.models.slu import Model, intent_logits, intent_predictions
    from tpu_slu.ops.pallas_gru import gru_pallas_available

    gru_impl = args.gru_impl
    if gru_impl == "auto":
        gru_impl = "pallas" if gru_pallas_available() else "scan"
    record["gru_impl"] = gru_impl
    record["backend"] = jax.default_backend()

    record["phase"] = "build_model"
    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    model = Model(config)
    earch, iarch = model.encoder_arch, model.intent_arch
    params = model.params["pretrained_model"]

    B, T = args.batch, int(args.seconds * 16000)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T), np.float32))

    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    fwd = jax.jit(
        lambda p, x: enc.encoder_features(
            p, earch, x, gru_impl=gru_impl, compute_dtype=compute_dtype
        )
    )

    record["phase"] = "compile_primary"
    t0 = time.time()
    np.asarray(fwd(params, x))
    compile_s = time.time() - t0
    record["compile_s"] = round(compile_s, 1)
    sections["encoder_fwd"] = {"compile_s": round(compile_s, 1)}
    # Cold-compile cost scaler for later sections' budget gates: ADAPTIVE.
    # Seeded from the primary's compile (the remote compile service is
    # windowed; if the primary compiled slow, assume the next jit will too),
    # then updated from each section's observed compile_s — the cold-cache
    # verification run showed post-primary compiles land at 3-12 s while the
    # primary pays 167 s (the XLA conv front-end dominates and is reused),
    # so a pinned scaler skips sections the budget could easily afford.
    ccs = {"v": max(compile_s, 15.0)}

    def cc():
        return ccs["v"]

    # ---- PRIMARY METRIC (always measured first) ----------------------------
    # Device-time throughput via two-point slope: K queued executions + one
    # sync, minus the 1-execution baseline, divides out the host<->device RPC
    # overhead (the axon relay costs ~70 ms per sync, which a pipelined
    # training/serving loop never pays per step).
    def run(k):
        t0 = time.time()
        for _ in range(k):
            out = fwd(params, x)
        np.asarray(out)
        return time.time() - t0

    record["phase"] = "measure_primary"
    run(2)  # warmup
    # Measure-until-converged, but never let the primary eat the whole
    # budget: leave room for the promoted decode + train sections.
    slope_budget = min(240.0, max(45.0, remaining() - 300.0))
    dt, fb = robust_slope(
        run, args.iters, budget_s=slope_budget,
        min_s=min(90.0, 0.5 * slope_budget), patience=8, spacing_s=3.0,
    )
    if fb:
        fallback_metrics.append("encoder_fwd")
    utt_per_s = B / dt

    baseline = TORCH_CPU_BASELINE_UTT_S
    # HBM-bandwidth roofline (the BASELINE.json north-star framing): achieved
    # bytes/s over the v5e's 819 GB/s, using the optimistic-fusion *minimum*
    # traffic model (see min_encoder_hbm_bytes) so the fraction is <= 1.0 and
    # "fraction of roofline" is a checkable claim.
    hbm_bytes = min_encoder_hbm_bytes(earch, B, T)
    achieved_gbps = hbm_bytes / dt / 1e9
    # Combined speed-of-light: the binding unit floor (HBM bytes, MXU flops,
    # or VPU gate-chain ops — whichever is slowest) over the measured time.
    floors = encoder_unit_floors_us(earch, B, T)
    record.update({
        "value": round(utt_per_s, 1),
        "vs_baseline": round(utt_per_s / baseline, 2),
        "hbm_roofline_frac": round(achieved_gbps / V5E_HBM_GBPS, 3),
        "achieved_gbps": round(achieved_gbps, 1),
        "sol_frac": round(max(floors.values()) / (dt * 1e6), 3),
        "unit_floors_us": {k: round(v, 1) for k, v in floors.items()},
        "ms_per_iter_device": round(dt * 1000, 3),
    })

    # ---- optional sections, cheapest/most-diagnostic first ------------------
    def section(name, est_fn, fn):
        """Run one optional section under the budget gate.

        ``est_fn()`` is evaluated at gate time (it reads the adaptive cc());
        ``fn(entry)`` may record per-section details (compile_s) into its
        ``sections`` entry; any exception is caught so a failed section can
        never take the contract line down with it. Each section's observed
        compile_s feeds the scaler for the NEXT section's gate."""
        if emitted.is_set():
            return None
        est_s = est_fn()
        if remaining() < est_s:
            sections[name] = {"status": skipped, "est_s": round(est_s)}
            return None
        record["phase"] = name
        entry = sections.setdefault(name, {})
        t0 = time.time()
        try:
            out = fn(entry)
            entry["status"] = "ok"
            return out
        except Exception as e:
            entry["status"] = f"failed: {e}"
            return None
        finally:
            entry["wall_s"] = round(time.time() - t0, 1)
            if isinstance(entry.get("compile_s"), (int, float)):
                ccs["v"] = max(15.0, float(entry["compile_s"]))

    # Per-program dispatch floor: a noop (8,128) x+1 program, slope-measured
    # the same way. tools/bench_launch.py + tools/bench_residual.py measured
    # (2026-08-18) that EVERY queued program execution through this runtime
    # pays ~100-320 us regardless of content; in good relay windows it
    # overlaps with device compute, in bad ones it serializes — which is the
    # minute-scale ±40% swing. See docs/KERNELS.md "Where the residual lives".
    def measure_dispatch(entry):
        noop = jax.jit(lambda t: jnp.sum(t + 1.0))
        tiny_arg = jnp.zeros((8, 128), jnp.float32)
        np.asarray(noop(tiny_arg))

        def nrun(k):
            t0 = time.time()
            for _ in range(k):
                out = noop(tiny_arg)
            np.asarray(out)
            return time.time() - t0

        nrun(2)
        nd, fb = robust_slope(nrun, 120, outer=3)
        if fb:
            fallback_metrics.append("dispatch")
        record["dispatch_us"] = round(float(nd * 1e6), 1)

    section("dispatch", lambda: 30.0, measure_dispatch)

    # Stable DEVICE time per forward: 8 iterations inside ONE program via
    # lax.scan, inputs generated on device (x scaled per iteration — a
    # loop-VARIANT body, so XLA cannot hoist it). Measured spread across
    # relay windows is ~±2% (tools/bench_residual.py), so this is the number
    # that tracks real kernel regressions.
    K_SCAN = 8

    def measure_device_scan(entry):
        def _scan_dev(p, xx):
            def body(acc, i):
                xi = xx * (1.0 + i.astype(jnp.float32) / K_SCAN)
                return acc + jnp.sum(enc.encoder_features(
                    p, earch, xi, gru_impl=gru_impl, compute_dtype=compute_dtype
                )), None

            return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K_SCAN))[0]

        fwd_scan = jax.jit(_scan_dev)
        t0 = time.time()
        np.asarray(fwd_scan(params, x))
        entry["compile_s"] = round(time.time() - t0, 1)

        def srun(k):
            t0 = time.time()
            for _ in range(k):
                out = fwd_scan(params, x)
            np.asarray(out)
            return time.time() - t0

        srun(2)
        sd, fb = robust_slope(srun, 12, outer=3)
        if fb:
            fallback_metrics.append("device_scan")
        device_us = float(sd * 1e6 / K_SCAN)
        record["device_us_scan8"] = round(device_us, 1)
        # device-only speed-of-light fraction: per-program dispatch amortized
        # 8x and window variance gone — isolates kernel quality from relay
        # weather (the number the residual attribution trusts).
        record["sol_frac_device"] = round(max(floors.values()) / device_us, 3)
        # Refined floor (round 5, tools/bench_gatechain.py): the measured
        # per-step cost of the production recurrence chain at this batch,
        # summed over the flagship's 750 steps, ADDED to the HBM byte floor.
        # The additive model is empirically verified at B=128 (316 + 114 =
        # 430 us vs 434.7 measured in-window); the chain is throughput-bound
        # (indep == chained at B>=128), so neither term amortizes with batch
        # — which is why the wall scales ~2x with B. Informational; read
        # from the committed measurement like the serving percentiles.
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "experiments", "gatechain_floor_v5e.json")) as f:
                gc_chain = json.load(f)["floor_us"].get(str(args.batch))
            if gc_chain:
                record["chain_floor_us"] = gc_chain
                record["sol_frac_refined"] = round(
                    (floors["hbm"] + gc_chain) / device_us, 3)
        except Exception:
            pass

    section("device_scan8", lambda: 1.5 * cc() + 60.0, measure_device_scan)

    # p50 decode-path latency: single utterance, encoder + intent head +
    # argmax. The DEVICE slope is the promoted headline (VERDICT r4 #5).
    def measure_decode(entry):
        decode = jax.jit(
            lambda p, x: intent_predictions(
                intent_logits(
                    p["intent_layers"], iarch,
                    enc.encoder_features(p["pretrained_model"], earch, x, gru_impl=gru_impl),
                ),
                iarch.values_per_slot,
            )
        )
        x1 = jnp.asarray(np.random.default_rng(1).standard_normal((1, 57600), np.float32))
        t0 = time.time()
        np.asarray(decode(model.params, x1))
        entry["compile_s"] = round(time.time() - t0, 1)
        lat = []
        for _ in range(15):
            t0 = time.time()
            np.asarray(decode(model.params, x1))
            lat.append(time.time() - t0)
        record["p50_decode_ms"] = round(float(np.percentile(lat, 50) * 1000), 1)

        def drun(k):
            t0 = time.time()
            for _ in range(k):
                out = decode(model.params, x1)
            np.asarray(out[0])
            return time.time() - t0

        # 120 queued iterations: the B=1 decode does so little device work
        # that shorter queues leave the slope at the mercy of sync jitter.
        dd, fb = robust_slope(drun, 120, outer=4)
        if fb:
            fallback_metrics.append("decode")
        record["decode_device_ms"] = round(float(dd * 1000), 3)
        record["p50_decode_device_ms"] = record["decode_device_ms"]

    section("decode", lambda: cc() + 50.0, measure_decode)

    # Full SLU train step (fwd + bwd + masked flat Adam + dropout RNG) via the
    # REAL Trainer jit — traced mask vector, in-jit fold_in, donation.
    # Measured at the reference's training batch (64, no_unfreezing.cfg) so
    # the number tracks the parity workload regardless of --batch.
    def measure_train_step(entry):
        from tpu_slu.training.optim import expand_mask
        from tpu_slu.training.trainer import Trainer

        Bt = 64
        trainer = Trainer(model, config)
        batch = {
            "x": jnp.asarray(
                np.random.default_rng(0).standard_normal((Bt, T), np.float32)
            ),
            "y_intent": jnp.asarray(
                np.stack(
                    [np.random.default_rng(2).integers(0, n, Bt) for n in iarch.values_per_slot], 1
                ).astype(np.int32)
            ),
            "w": jnp.ones((Bt,), jnp.float32),
            "len": jnp.full((Bt,), T, jnp.int32),
        }
        mask = jax.device_put(expand_mask(model.params, model.trainable_mask()))
        state = {"p": trainer._params_carry(), "o": trainer.opt_state}

        def step():
            state["p"], state["o"], (loss, _) = trainer._train_step(
                state["p"], state["o"], mask, trainer._next_step_idx(), batch
            )
            return loss

        t0 = time.time()
        np.asarray(step())
        entry["compile_s"] = round(time.time() - t0, 1)

        def trun(k):
            t0 = time.time()
            loss = None
            for _ in range(k):
                loss = step()
            np.asarray(loss)
            return time.time() - t0

        trun(2)
        ts, fb = robust_slope(trun, 30, outer=3)
        if fb:
            fallback_metrics.append("train_step")
        record["train_step_ms"] = round(float(ts * 1000), 3)
        # Train-step speed-of-light fraction (round 5,
        # tools/bench_trainstep_floor.py): additive optimistic floor
        # (fwd HBM+chain, 2x each for bwd, 10P Adam bytes) over the
        # committed measurement — informational, like chain_floor_us.
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "experiments", "trainstep_floor_v5e.json")) as f:
                tf = json.load(f)
            if tf.get("batch") == Bt:
                record["train_floor_us"] = tf["floor_us"]["train"]
                record["sol_frac_train"] = round(
                    tf["floor_us"]["train"] / (float(ts) * 1e6), 3)
        except Exception:
            pass

    section("train_step", lambda: 3.0 * cc() + 60.0, measure_train_step)

    # Shared seq2seq model for the beam + train sections (one param init /
    # model build through the relay instead of two).
    s2s = {}

    def s2s_model():
        if "model" not in s2s:
            import copy

            s_cfg = copy.copy(config)
            s_cfg.seq2seq = True
            s_cfg.Sy_intent = ["<sos>"] + [chr(32 + i) for i in range(95)] + ["<eos>"]
            s_cfg.intent_encoder_dim = 128
            s_cfg.num_intent_encoder_layers = 1
            s_cfg.intent_decoder_dim = 256
            s_cfg.num_intent_decoder_layers = 2
            s_cfg.intent_decoder_key_dim = 128
            s_cfg.intent_decoder_value_dim = 256
            s_cfg.seq2seq_max_decode_len = 200
            s_cfg.folder = tempfile.mkdtemp()
            s2s["cfg"] = s_cfg
            s2s["model"] = Model(s_cfg)
        return s2s["cfg"], s2s["model"]

    # Seq2seq beam decode (hot loop C, reference models.py:588-650): small
    # fixed shape so the driver sees decode-path regressions. B=16 keeps the
    # serialized executable small through the relay.
    def measure_seq2seq_beam(entry, Bs=16, beam=4):
        s_cfg, s_model = s2s_model()
        xs = jnp.asarray(
            np.random.default_rng(3).standard_normal((Bs, T), np.float32)
        )
        infer = jax.jit(
            lambda p, x: slu_mod.seq2seq_beam_infer(
                p, s_model.seq2seq_arch,
                enc.encoder_features(
                    p["pretrained_model"], s_model.encoder_arch, x, gru_impl=gru_impl
                ),
                beam, gru_impl=gru_impl,
            )
        )
        t0 = time.time()
        scores, _ = infer(s_model.params, xs)
        np.asarray(scores)
        entry["compile_s"] = round(time.time() - t0, 1)

        def srun(k):
            t0 = time.time()
            for _ in range(k):
                scores, _ = infer(s_model.params, xs)
            np.asarray(scores)
            return time.time() - t0

        srun(2)
        ss, fb = robust_slope(srun, 20, outer=3)
        if fb:
            fallback_metrics.append("seq2seq_beam")
        record["seq2seq_beam_ms"] = round(float(ss * 1000), 3)

    section("seq2seq_beam", lambda: 2.5 * cc() + 50.0, measure_seq2seq_beam)

    # Dual-head ASR pretraining step (reference training.py:49-83,
    # models.py:291-331): fwd + bwd through both vocab heads (42 phonemes +
    # 10k words) via the REAL Trainer jit, B=64 at the reference's 2.25 s
    # pretraining crop mean. Returns the trainer for the 5 s-bucket smoke.
    asr = {}

    def measure_asr_step(entry, Bt=64, seconds=2.25):
        import copy

        from tpu_slu.models.encoder import PretrainedModel
        from tpu_slu.training.trainer import Trainer

        a_cfg = copy.copy(config)
        a_cfg.pretraining_type = 2
        a_cfg.folder = tempfile.mkdtemp()
        pre = PretrainedModel(a_cfg)
        trainer = Trainer(pre, a_cfg)
        asr["cfg"], asr["trainer"] = a_cfg, trainer
        Tp = int(seconds * 16000)
        batch = _asr_batch(a_cfg, Bt, Tp, seed=4)
        state = {"p": trainer._params_carry(), "o": trainer.opt_state}

        def step():
            state["p"], state["o"], aux = trainer._train_step(
                state["p"], state["o"], trainer._next_step_idx(), batch
            )
            return aux[0]

        t0 = time.time()
        np.asarray(step())
        entry["compile_s"] = round(time.time() - t0, 1)

        def arun(k):
            t0 = time.time()
            aux0 = None
            for _ in range(k):
                aux0 = step()
            np.asarray(aux0)
            return time.time() - t0

        arun(2)
        ts, fb = robust_slope(arun, 30, outer=3)
        if fb:
            fallback_metrics.append("asr_step")
        record["asr_step_ms"] = round(float(ts * 1000), 3)
        # The jitted step DONATES its params/opt-state args, so the arrays the
        # trainer object still references are deleted buffers now. Write the
        # threaded state back so the 5 s-bucket smoke can reuse this trainer
        # (r5 hardware run: "Array has been deleted with shape=float32[...]").
        trainer.opt_state = state["o"]
        asr["carry"] = state["p"]

    def _asr_batch(a_cfg, Bt, Tp, seed):
        r = np.random.default_rng(seed)
        return {
            "x": jnp.asarray(r.standard_normal((Bt, Tp), np.float32)),
            "y_phoneme": jnp.asarray(r.integers(
                -1, a_cfg.num_phonemes,
                (Bt, -(-Tp // a_cfg.phone_downsample_factor)),
            ).astype(np.int32)),
            "y_word": jnp.asarray(r.integers(
                -1, a_cfg.vocabulary_size,
                (Bt, -(-Tp // a_cfg.word_downsample_factor)),
            ).astype(np.int32)),
            "w": jnp.ones((Bt,), jnp.float32),
        }

    section("asr_step", lambda: 2.5 * cc() + 50.0, measure_asr_step)

    # Seq2seq teacher-forced train step (reference models.py:515-556 driven
    # by training.py:84-119): fwd + bwd + masked Adam via the REAL Trainer
    # jit, U=32 decode steps (typical FSC semantics-string length).
    def measure_seq2seq_train(entry, Bt=64, U=32):
        from tpu_slu.training.optim import expand_mask
        from tpu_slu.training.trainer import Trainer

        s_cfg, s_model = s2s_model()
        trainer = Trainer(s_model, s_cfg)
        Sy = len(s_cfg.Sy_intent)
        r = np.random.default_rng(5)
        labels = r.integers(1, Sy - 1, (Bt, U))
        labels[:, 0] = s_model.SOS
        labels[:, -1] = Sy - 1  # <eos>
        batch = {
            "x": jnp.asarray(r.standard_normal((Bt, T), np.float32)),
            "y_intent": jnp.asarray(np.eye(Sy, dtype=np.float32)[labels]),
            "w": jnp.ones((Bt,), jnp.float32),
            "len": jnp.full((Bt,), T, jnp.int32),
            "y_len": jnp.full((Bt,), U, jnp.int32),
        }
        mask = jax.device_put(expand_mask(s_model.params, s_model.trainable_mask()))
        state = {"p": trainer._params_carry(), "o": trainer.opt_state}

        def step():
            state["p"], state["o"], (loss, _) = trainer._train_step(
                state["p"], state["o"], mask, trainer._next_step_idx(), batch
            )
            return loss

        t0 = time.time()
        np.asarray(step())
        entry["compile_s"] = round(time.time() - t0, 1)

        def strun(k):
            t0 = time.time()
            loss = None
            for _ in range(k):
                loss = step()
            np.asarray(loss)
            return time.time() - t0

        strun(2)
        ts, fb = robust_slope(strun, 20, outer=3)
        if fb:
            fallback_metrics.append("seq2seq_train")
        record["seq2seq_train_ms"] = round(float(ts * 1000), 3)

    section("seq2seq_train", lambda: 3.0 * cc() + 50.0, measure_seq2seq_train)

    # 5 s-bucket ASR hardware smoke (VERDICT r4 #7): the scoped-VMEM OOM
    # class was found by an ablation, not the bench — the shared GRU bwd
    # kernel's working set crosses Mosaic's default 16 MB limit only at long
    # buckets, only in-program. One real Trainer step at the T=80k bucket
    # proves the raised limit holds on hardware each round.
    def asr_5s_smoke(entry, Bt=64):
        if "trainer" not in asr:
            import copy

            from tpu_slu.models.encoder import PretrainedModel
            from tpu_slu.training.trainer import Trainer

            a_cfg = copy.copy(config)
            a_cfg.pretraining_type = 2
            a_cfg.folder = tempfile.mkdtemp()
            asr["cfg"], asr["trainer"] = a_cfg, Trainer(PretrainedModel(a_cfg), a_cfg)
        a_cfg, trainer = asr["cfg"], asr["trainer"]
        Tp = 5 * 16000
        batch = _asr_batch(a_cfg, Bt, Tp, seed=6)
        t0 = time.time()
        p, o, aux = trainer._train_step(
            asr.get("carry", trainer._params_carry()), trainer.opt_state,
            trainer._next_step_idx(), batch
        )
        loss = float(np.asarray(aux[0]))
        entry["compile_s"] = round(time.time() - t0, 1)
        if not np.isfinite(loss):
            raise RuntimeError(f"non-finite 5s-bucket ASR loss {loss}")
        record["asr_5s_smoke"] = "ok"

    section("asr_5s_smoke", lambda: 2.0 * cc() + 30.0, asr_5s_smoke)

    if args.measure_baseline and remaining() > 120.0:
        record["phase"] = "torch_baseline"
        try:
            baseline = measure_torch_baseline()
            record["baseline"] = "reference torch-CPU encoder fwd %.1f utt/s" % baseline
            record["vs_baseline"] = round(utt_per_s / baseline, 2)
        except Exception as e:
            sections["torch_baseline"] = {"status": f"failed: {e}"}

    record["phase"] = "done"
    emit()


if __name__ == "__main__":
    main()
