"""bench.py helpers: the slope estimator must never report absurd numbers.

A relay latency spike during the 1-iteration baseline once produced a
degenerate two-point slope (clamped to 1e-6 s -> "128M utt/s" with a
roofline fraction of 316). These tests pin the sanity filter with synthetic
timing models; no TPU needed.
"""

import sys

import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import min_encoder_hbm_bytes, robust_slope  # noqa: E402


def make_run(per_iter, rpc, spikes=None):
    """run(k) -> wall time: k * per_iter + rpc, with optional per-call
    spike overrides keyed by call index."""
    calls = {"n": 0}
    spikes = spikes or {}

    def run(k):
        extra = spikes.get(calls["n"], 0.0)
        calls["n"] += 1
        return k * per_iter + rpc + extra

    return run


def test_clean_timings_recover_slope():
    dt, fb = robust_slope(make_run(0.5e-3, 70e-3), iters=100, outer=3)
    assert abs(dt - 0.5e-3) < 1e-9
    assert fb is False


def test_baseline_spike_is_rejected():
    """A spike that lands on every 1-iter baseline makes tk - t1 <= 0; the
    estimator must fall back to the whole-run upper bound, never report a
    near-zero slope — and must SAY it fell back (ADVICE r2)."""
    # each outer round: 3x run(1), 2x run(101) -> baseline calls are
    # 0,1,2 / 5,6,7 / 10,11,12
    spikes = {i: 10.0 for i in (0, 1, 2, 5, 6, 7, 10, 11, 12)}
    dt, fb = robust_slope(make_run(0.5e-3, 70e-3, spikes), iters=100, outer=3)
    upper = (100 * 0.5e-3 + 0.5e-3 + 70e-3) / 101
    assert abs(dt - upper) < 1e-9
    assert dt > 0.5e-3  # conservative: never faster than truth
    assert fb is True


def test_single_spiked_round_is_ignored():
    """One poisoned round out of three: the clean rounds win."""
    spikes = {0: 10.0, 1: 10.0, 2: 10.0}  # only round 1's baselines
    dt, fb = robust_slope(make_run(0.5e-3, 70e-3, spikes), iters=100, outer=3)
    assert abs(dt - 0.5e-3) < 1e-9
    assert fb is False


class FakeClock:
    """Deterministic clock/sleep pair for the converged mode."""

    def __init__(self):
        self.t = 0.0

    def clock(self):
        return self.t

    def sleep(self, s):
        self.t += s


def test_converged_mode_rides_out_a_bad_window():
    """A bad relay window inflates every timing 2x for the first 60 "s";
    the converged estimator must keep measuring past it and report the
    good-window slope (the BENCH_r02 failure mode: a one-shot burst recorded
    0.747 ms against a same-code 0.433)."""
    fake = FakeClock()
    calls = {"n": 0}

    def run(k):
        calls["n"] += 1
        fake.t += 0.1  # each measurement call advances time
        per_iter = 1.0e-3 if fake.t < 60.0 else 0.5e-3
        return k * per_iter + 70e-3

    dt, fb = robust_slope(
        run, iters=100, budget_s=240.0, min_s=90.0, patience=4,
        spacing_s=3.0, sleep=fake.sleep, clock=fake.clock,
    )
    assert abs(dt - 0.5e-3) < 1e-9
    assert fb is False


def test_converged_mode_stops_when_stable():
    """Stable timings: the loop exits at min_s + patience, not the full
    budget."""
    fake = FakeClock()

    def run(k):
        fake.t += 0.1
        return k * 0.5e-3 + 70e-3

    dt, fb = robust_slope(
        run, iters=100, budget_s=600.0, min_s=30.0, patience=3,
        spacing_s=2.0, sleep=fake.sleep, clock=fake.clock,
    )
    assert abs(dt - 0.5e-3) < 1e-9
    assert fake.t < 120.0  # converged long before the 600 s budget


def test_converged_mode_respects_budget():
    """Estimates that keep improving forever still stop at budget_s."""
    fake = FakeClock()
    state = {"per": 2.0e-3}

    def run(k):
        fake.t += 0.1
        state["per"] *= 0.97  # always improving -> patience never triggers
        return k * state["per"] + 70e-3

    dt, fb = robust_slope(
        run, iters=100, budget_s=50.0, min_s=10.0, patience=3,
        spacing_s=1.0, sleep=fake.sleep, clock=fake.clock,
    )
    assert fake.t <= 60.0
    assert fb is False


def test_byte_model_counts_layer_boundaries_only():
    """The roofline byte model: a GRU contributes its input read + output
    write, never the 3H gate streams (the fused kernels keep them in VMEM)."""

    class Spec:
        def __init__(self, kind, h):
            self.kind, self.h = kind, h

    class Arch:
        phoneme_layers = (Spec("gru", (60, 128, True)),)
        word_layers = ()

    b, t = 4, 100
    total = min_encoder_hbm_bytes(Arch(), b, t)
    f32 = 4
    # input stream starts at the 1-channel waveform (read once), output is
    # the bidirectional hidden stream (written once)
    assert total == b * t * 1 * f32 + b * t * 128 * 2 * f32

def test_unit_floor_model_matches_hand_count():
    """The speed-of-light unit floors: MXU flops are the conv + GRU matmuls,
    the VPU floor counts only the gate chain (3H tanh-class + 12H elementwise
    per step per direction), and HBM mirrors the byte model."""
    from bench import (V5E_HBM_GBPS, V5E_MXU_BF16_TFLOPS, V5E_VPU_ELEM_TOPS,
                       V5E_VPU_TANH_TELEM_S, encoder_unit_floors_us)

    class Spec:
        def __init__(self, kind, h):
            self.kind, self.h = kind, h

    class Arch:
        phoneme_layers = (Spec("conv", (1, 8, 5, 2, 0)),)
        word_layers = (Spec("gru", (8, 16, True)),)

    b, t = 4, 101
    t_conv = (101 - 5) // 2 + 1  # 49
    floors = encoder_unit_floors_us(Arch(), b, t)
    flops = 2 * b * t_conv * 8 * 1 * 5 + 2 * b * t_conv * 2 * (8 + 16) * 3 * 16
    assert floors["mxu"] == pytest.approx(flops / (V5E_MXU_BF16_TFLOPS * 1e12) * 1e6)
    tanh = b * t_conv * 2 * 3 * 16
    elem = b * t_conv * 2 * 12 * 16
    assert floors["vpu"] == pytest.approx(
        (tanh / (V5E_VPU_TANH_TELEM_S * 1e12) + elem / (V5E_VPU_ELEM_TOPS * 1e12)) * 1e6
    )
    assert floors["hbm"] == pytest.approx(
        min_encoder_hbm_bytes(Arch(), b, t) / (V5E_HBM_GBPS * 1e9) * 1e6
    )


def test_unit_floors_flagship_magnitudes():
    """At the flagship bench shape the floors must reproduce the measured
    decomposition (docs/KERNELS.md): HBM ~316 us is the binding unit, MXU and
    VPU below it, and all three sit under the ~480 us measured wall."""
    import __graft_entry__
    import tempfile
    from bench import encoder_unit_floors_us
    from tpu_slu.models.slu import Model

    config = __graft_entry__._make_config(tempfile.mkdtemp(), small=False)
    arch = Model(config).encoder_arch
    floors = encoder_unit_floors_us(arch, 128, 64000)
    assert 250 < floors["hbm"] < 400
    assert 150 < floors["mxu"] < 350
    assert 100 < floors["vpu"] < 300
    assert max(floors.values()) == floors["hbm"]
