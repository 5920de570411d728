"""Training engine: jitted train/eval steps, epoch loop, logging, checkpoints.

Rebuild of the reference ``Trainer`` (reference ``training.py:9-171``):
Adam (lr from pretraining_lr/training_lr by model type), per-epoch train/test
over the dataset loaders, ``log.csv`` rows per pass, per-epoch checkpoints,
and the per-epoch ``unfreeze_one_layer()`` ULMFiT trigger for SLU training.

TPU design points:

* One jitted train step per model type, with the trainable mask and RNG as
  *traced* arguments — the unfreezing schedule never triggers a recompile
  (SURVEY.md §7 hard part c). Params/opt-state buffers are donated.
* Length-bucketed batches mean a handful of compiled variants per step.
* Unlike the reference (which silently resumes with a fresh optimizer and
  epoch 0, reference ``training.py:20-33``), checkpoints include optimizer
  moments, epoch counter, and the unfreezing index.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from tpu_slu.data.datasets import ASRDataset
from tpu_slu.models import encoder as enc
from tpu_slu.models import slu as slu_mod
from tpu_slu.models.encoder import PretrainedModel
from tpu_slu.training import checkpoint as ckpt
from tpu_slu.training.optim import expand_mask, flat_adam_init, flat_adam_update


def _weighted_mean(total, count):
    return total / max(count, 1e-9)


def _all_hosts_sum(scalars, process_count=None, allgather=None):
    """Sum metric scalars across hosts. Single-process: identity.

    On a pod slice every host iterates its own input shard
    (loader.py process sharding), so device-accumulated totals cover 1/Pth of
    the epoch; log.csv rows must aggregate the global batch.

    ``process_count``/``allgather`` are injectable so the multi-host branch
    is unit-testable without a real pod (tests/test_multihost.py): defaults
    resolve to ``jax.process_count()`` and
    ``multihost_utils.process_allgather``."""
    pcount = jax.process_count() if process_count is None else process_count
    if pcount == 1:
        return scalars
    if allgather is None:
        from jax.experimental import multihost_utils

        allgather = multihost_utils.process_allgather
    stacked = allgather(jnp.stack([jnp.asarray(v, jnp.float32) for v in scalars]))
    stacked = np.asarray(stacked)
    assert stacked.shape == (pcount, len(scalars)), (
        f"allgather returned {stacked.shape}, expected ({pcount}, {len(scalars)})"
    )
    return list(stacked.sum(axis=0))


class Trainer:
    def __init__(self, model, config):
        self.model = model
        self.config = config
        self.is_pretraining = isinstance(model, PretrainedModel)
        if self.is_pretraining:
            self.lr = config.pretraining_lr
            self.checkpoint_path = os.path.join(config.folder, "pretraining")
            batch_size = config.pretraining_batch_size
        else:
            self.lr = config.training_lr
            self.checkpoint_path = os.path.join(config.folder, "training")
            batch_size = config.training_batch_size
        os.makedirs(self.checkpoint_path, exist_ok=True)
        self.epoch = 0
        self._rows: list[dict] = []
        # RBG bit generator: much cheaper dropout-mask generation on TPU than
        # the threefry default (measured ~0.35 ms/step of threefry hashing on
        # the flagship model); override with config prng_impl=threefry.
        self._base_rng = jax.random.key(
            config.seed, impl=getattr(config, "prng_impl", "rbg")
        )
        self._step_count = 0
        self._ckpt_backend = getattr(config, "checkpoint_backend", "npz")
        ext = "orbax" if self._ckpt_backend == "orbax" else "npz"
        self._model_ckpt = os.path.join(self.checkpoint_path, f"model_state.{ext}")
        self._trainer_ckpt = os.path.join(self.checkpoint_path, f"trainer_state.{ext}")

        # Parallelism: with >1 device and a divisible batch, shard batches
        # over the mesh's data axis — GSPMD inserts the gradient all-reduce
        # over ICI (SURVEY.md §5). config model_parallel=N>1 additionally
        # builds a (data, model) mesh and column-shards the phoneme/word
        # vocab-head matrices over the model axis (parallel/mesh.py). The
        # fixed batch dim from the loader means one compiled step per bucket
        # regardless of device count.
        self.mesh = None
        mp = max(1, getattr(config, "model_parallel", 1))
        n_dev = len(jax.devices())
        # Optional cap (config n_devices): mesh over a prefix of the visible
        # devices — used by dryrun_multichip(n) when the host exposes more
        # virtual devices than the requested mesh size.
        cap = int(getattr(config, "n_devices", 0) or 0)
        if cap:
            n_dev = min(n_dev, cap)
        if n_dev > 1 and getattr(config, "data_parallel", True):
            if mp > 1 and n_dev % mp != 0:
                print(f"model_parallel={mp} disabled: {n_dev} devices not divisible")
                mp = 1
            if batch_size % (n_dev // mp) == 0:
                from tpu_slu.parallel.mesh import make_mesh

                self.mesh = make_mesh(n_dev, model_parallel=mp)
            else:
                print(
                    f"data parallelism disabled: batch size {batch_size} not "
                    f"divisible by {n_dev // mp} data-parallel devices"
                )
        elif mp > 1:
            print(f"model_parallel={mp} ignored: single device")
        self.model_parallel = mp if self.mesh is not None else 1
        # Flat (raveled) Adam can't carry mixed shardings in one vector, so
        # tensor-parallel runs use per-leaf Adam whose m/v mirror the param
        # shardings (identical math, optim.py).
        if self.model_parallel > 1:
            from tpu_slu.training.optim import adam_init

            self.opt_state = adam_init(model.params)
        else:
            self.opt_state = flat_adam_init(model.params)
        if self.mesh is not None:
            self._shard_state()
        self._build_steps()

    def _shardings(self):
        from tpu_slu.parallel.mesh import opt_state_shardings, param_shardings

        p_shard = param_shardings(self.mesh, self.model.params)
        o_shard = opt_state_shardings(self.mesh, self.model.params, p_shard, self.opt_state)
        return p_shard, o_shard

    def _shard_state(self):
        """Place params/opt-state on the mesh (replicated; vocab heads
        model-sharded when model_parallel > 1)."""
        p_shard, o_shard = self._shardings()
        self.model.params = jax.device_put(self.model.params, p_shard)
        self.opt_state = jax.device_put(self.opt_state, o_shard)

    def _jit_step(self, fn, n_extras: int):
        """jit a ``(params, opt_state, *extras, batch)`` step, with explicit
        shardings pinned when the mesh has a model axis (extras replicate,
        batches shard on the data axis)."""
        if self.mesh is None or self.model_parallel <= 1:
            return jax.jit(fn, donate_argnums=(0, 1))
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_slu.parallel.mesh import DATA_AXIS

        p_shard, o_shard = self._shardings()
        rep = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P(DATA_AXIS))
        return jax.jit(
            fn,
            in_shardings=(p_shard, o_shard) + (rep,) * n_extras + (data,),
            out_shardings=(p_shard, o_shard, None),
            donate_argnums=(0, 1),
        )

    def _place_batch(self, batch):
        if self.mesh is None:
            return jax.device_put(batch)
        from tpu_slu.parallel.mesh import shard_batch

        return shard_batch(batch, self.mesh)

    def _batches(self, dataset):
        """Iterate (real_count, device_batch) with transfers overlapped."""
        from tpu_slu.data.loader import device_prefetch

        return device_prefetch(dataset.loader, self._place_batch)

    # -- jitted steps ---------------------------------------------------------

    def _build_steps(self):
        from tpu_slu.ops.gru import resolve_gru_impl
        from tpu_slu.training.optim import adam_update, flat_adam_vector_update

        # Flat mode (model_parallel <= 1): the train step takes and returns
        # the RAVELED (P,) param vector; the forward reads bitcast views of
        # it (the per-step ravel/unravel concatenates cost ~0.2 ms measured).
        # Tensor-parallel runs keep the tree API (mixed shardings can't live
        # in one vector).
        flat_mode = self.model_parallel <= 1
        if flat_mode:
            from jax.flatten_util import ravel_pytree

            _, self._unravel = ravel_pytree(self.model.params)
        adam_fn = flat_adam_update if flat_mode else adam_update
        lr = self.lr
        clip = getattr(self.config, "gradient_clip_norm", 0.0)
        gru_impl = resolve_gru_impl(self.config)
        mask_padding = getattr(self.config, "mask_padding", True)
        compute_dtype = (
            jnp.bfloat16
            if getattr(self.config, "compute_dtype", "float32") == "bfloat16"
            else None
        )

        def clip_grads(grads):
            if clip <= 0.0:
                return grads
            gnorm = jnp.sqrt(
                sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
            )
            scale = jnp.minimum(1.0, clip / (gnorm + 1e-9))
            return jax.tree.map(lambda g: g * scale, grads)

        if self.is_pretraining:
            arch = self.model.arch
            ptype = self.config.pretraining_type
            if ptype not in (1, 2, 3):
                # The reference crashes with an undefined `loss` here
                # (training.py:61-63); fail with an actionable message.
                raise ValueError(
                    f"pretraining_type={ptype} has no pre-training loss; use "
                    "1 (phoneme), 2 (phoneme+word) or 3 (word), or skip --pretrain"
                )

            base_rng = self._base_rng
            unravel = self._unravel if flat_mode else (lambda p: p)

            def train_step(params, opt_state, step_idx, batch):
                # RNG derived INSIDE the jit: a host-side fold_in per step is
                # a separate tiny device dispatch that serializes with the
                # step through the relay (measured +2.6 ms/step, flagship).
                rng = jax.random.fold_in(base_rng, step_idx)

                def loss_fn(p):
                    pl_, wl, pa, wa = enc.encoder_loss(
                        unravel(p), arch, batch["x"], batch["y_phoneme"], batch["y_word"],
                        train=True, rng=rng, gru_impl=gru_impl,
                        compute_dtype=compute_dtype, weights=batch.get("w"),
                    )
                    loss = {1: pl_, 2: pl_ + wl, 3: wl}[ptype]
                    return loss, (pl_, wl, pa, wa)

                grads, aux = jax.grad(loss_fn, has_aux=True)(params)
                grads = clip_grads(grads)
                if flat_mode:
                    params, opt_state = flat_adam_vector_update(
                        params, grads, opt_state, jnp.ones_like(params), lr
                    )
                else:
                    mask = jax.tree.map(lambda _: 1.0, params)
                    params, opt_state = adam_fn(params, grads, opt_state, mask, lr)
                return params, opt_state, aux

            def eval_step(params, batch):
                return enc.encoder_loss(
                    params, arch, batch["x"], batch["y_phoneme"], batch["y_word"],
                    train=False, gru_impl=gru_impl, compute_dtype=compute_dtype,
                    weights=batch.get("w"),
                )

            self._train_step = self._jit_step(train_step, n_extras=1)
            self._eval_step = jax.jit(eval_step)
            return

        model = self.model
        earch = model.encoder_arch
        if not model.seq2seq:
            iarch = model.intent_arch

            def loss_fn_builder(x, y, w, lengths, train, rng, y_len=None):
                def loss_fn(p):
                    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
                    feats = enc.encoder_features(
                        p["pretrained_model"], earch, x, train=train, rng=r1,
                        gru_impl=gru_impl, compute_dtype=compute_dtype,
                    )
                    fm = None
                    if mask_padding and lengths is not None:
                        t_out = enc.frames_through(iarch.layers, feats.shape[1])
                        fm = slu_mod.frame_mask_from_lengths(earch, lengths, t_out, iarch)
                    logits = slu_mod.intent_logits(
                        p["intent_layers"], iarch, feats, train=train, rng=r2,
                        gru_impl=gru_impl, frame_mask=fm,
                    )
                    return slu_mod.intent_loss_acc(logits, y, iarch.values_per_slot, w)

                return loss_fn

        else:
            sarch = model.seq2seq_arch

            def loss_fn_builder(x, y, w, lengths, train, rng, y_len=None):
                def loss_fn(p):
                    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
                    feats = enc.encoder_features(
                        p["pretrained_model"], earch, x, train=train, rng=r1,
                        gru_impl=gru_impl, compute_dtype=compute_dtype,
                    )
                    enc_mask = None
                    if mask_padding and lengths is not None:
                        enc_mask = slu_mod.frame_mask_from_lengths(
                            earch, lengths, feats.shape[1]
                        )
                    # Mask decode steps past the batch's true max label
                    # length: keeps the loss at the reference's
                    # pad-to-batch-max scale, bucket-invariant (datasets.py).
                    num_steps = jnp.max(y_len) if y_len is not None else None
                    log_p = slu_mod.seq2seq_log_prob(
                        p, sarch, feats, y, train=train, rng=r2, gru_impl=gru_impl,
                        enc_mask=enc_mask, num_steps=num_steps,
                        # trace-time A/B hook (tools/bench_s2s_ab.py): the
                        # reference-shaped per-step embed/projection path
                        batched=os.environ.get("TPU_SLU_S2S_PERSTEP") != "1",
                    )
                    denom = jnp.maximum(w.sum(), 1.0)
                    return -(log_p * w).sum() / denom, jnp.zeros((), jnp.float32)

                return loss_fn

        base_rng = self._base_rng
        unravel = self._unravel if flat_mode else (lambda p: p)

        def full_train_step(params, opt_state, mask, step_idx, batch):
            rng = jax.random.fold_in(base_rng, step_idx)  # see ASR step note
            tree_loss_fn = loss_fn_builder(
                batch["x"], batch["y_intent"], batch["w"], batch.get("len"), True, rng,
                y_len=batch.get("y_len"),
            )
            loss_fn = lambda p: tree_loss_fn(unravel(p))  # noqa: E731
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = clip_grads(grads)
            if flat_mode:
                params, opt_state = flat_adam_vector_update(params, grads, opt_state, mask, lr)
            else:
                params, opt_state = adam_fn(params, grads, opt_state, mask, lr)
            return params, opt_state, (loss, acc)

        def eval_step(params, batch):
            loss_fn = loss_fn_builder(
                batch["x"], batch["y_intent"], batch["w"], batch.get("len"), False, None,
                y_len=batch.get("y_len"),
            )
            return loss_fn(params)

        self._train_step = self._jit_step(full_train_step, n_extras=2)
        self._eval_step = jax.jit(eval_step)

    def _next_step_idx(self):
        self._step_count += 1
        return np.int32(self._step_count)

    def _params_carry(self):
        """The value threaded through the jitted train step: the raveled
        (P,) vector in flat mode, the param tree under tensor parallelism."""
        if self.model_parallel > 1:
            return self.model.params
        from jax.flatten_util import ravel_pytree

        flat, _ = ravel_pytree(self.model.params)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            flat = jax.device_put(flat, NamedSharding(self.mesh, PartitionSpec()))
        return flat

    def _set_params_carry(self, carry):
        self.model.params = (
            carry if self.model_parallel > 1 else self._unravel(carry)
        )

    # -- checkpointing (reference training.py:23-39) --------------------------

    def load_checkpoint(self):
        model_path = self._model_ckpt
        if os.path.exists(model_path):
            try:
                self.model.params = ckpt.load(
                    model_path, self.model.params, self._ckpt_backend
                )
            except Exception as e:  # parity: fall back to scratch
                print(f"Could not load previous model; starting from scratch ({e})")
                return
        else:
            print("No previous model; starting from scratch")
            return
        trainer_path = self._trainer_ckpt
        if os.path.exists(trainer_path):
            try:
                state = ckpt.load(
                    trainer_path,
                    {
                        "opt": self.opt_state,
                        "epoch": np.zeros((), np.int32),
                        "unfreezing_index": np.zeros((), np.int32),
                        "unfrozen_count": np.zeros((), np.int32),
                    },
                    self._ckpt_backend,
                )
                self.opt_state = state["opt"]
                self.epoch = int(state["epoch"])
                if not self.is_pretraining:
                    self.model.unfreezing_index = int(state["unfreezing_index"])
                    self.model._unfrozen_count = int(state["unfrozen_count"])
            except Exception as e:
                print(f"Could not load trainer state; optimizer starts fresh ({e})")
        if self.mesh is not None:
            self._shard_state()

    def save_checkpoint(self):
        try:
            ckpt.save(self._model_ckpt, self.model.params, self._ckpt_backend)
            if not self.is_pretraining:
                import json

                with open(os.path.join(self.checkpoint_path, "vocab.json"), "w") as f:
                    json.dump(self.model.vocab_dict(), f)
            ckpt.save(
                self._trainer_ckpt,
                {
                    "opt": self.opt_state,
                    "epoch": np.asarray(self.epoch, np.int32),
                    "unfreezing_index": np.asarray(
                        getattr(self.model, "unfreezing_index", 0), np.int32
                    ),
                    "unfrozen_count": np.asarray(
                        getattr(self.model, "_unfrozen_count", 0), np.int32
                    ),
                },
                self._ckpt_backend,
            )
        except Exception as e:
            print(f"Could not save model ({e})")

    def log(self, results: dict):
        self._rows.append(results)
        pd.DataFrame(self._rows).to_csv(os.path.join(self.checkpoint_path, "log.csv"))

    # -- epochs ----------------------------------------------------------------

    def train(self, dataset, print_interval: int = 100):
        if isinstance(dataset, ASRDataset):
            return self._train_asr(dataset, print_interval)
        return self._train_slu(dataset, print_interval)

    def _train_asr(self, dataset, print_interval):
        from tpu_slu.utils.profiling import StepTimer, profile_trace

        # Metrics accumulate as device scalars: fetching them per step costs
        # two host<->device round-trips (~0.5 s/step through the axon relay
        # vs ~3 ms of device compute); sync only at print steps + epoch end.
        totals = {"phone_loss": 0.0, "phone_acc": 0.0, "word_loss": 0.0, "word_acc": 0.0}
        num_examples = 0.0
        t0 = time.time()
        timer = StepTimer()
        profile_dir = getattr(self.config, "profile_dir", None) if self.epoch == 0 else None
        carry = self._params_carry()
        # try/finally: an exception mid-epoch (loader error, KeyboardInterrupt)
        # must not discard completed steps — sync the latest carry back into
        # model.params on any exit.
        try:
            with profile_trace(profile_dir):
                for idx, (bs, batch) in enumerate(self._batches(dataset)):
                    num_examples += bs
                    with timer.step():
                        carry, self.opt_state, aux = self._train_step(
                            carry, self.opt_state, self._next_step_idx(), batch
                        )
                    pl_, wl, pa, wa = aux
                    totals["phone_loss"] = totals["phone_loss"] + pl_ * bs
                    totals["word_loss"] = totals["word_loss"] + wl * bs
                    totals["phone_acc"] = totals["phone_acc"] + pa * bs
                    totals["word_acc"] = totals["word_acc"] + wa * bs
                    if idx % print_interval == 0:
                        print(f"phoneme loss: {float(pl_)}")
                        print(f"word loss: {float(wl)}")
                        print(f"phoneme acc: {float(pa)}")
                        print(f"word acc: {float(wa)}")
        finally:
            try:
                self._set_params_carry(carry)
            except RuntimeError:
                # carry was donated into a step that failed mid-flight; the
                # original exception (propagating) is the real story
                pass
        keys = list(totals)
        sums = _all_hosts_sum([totals[k] for k in keys] + [num_examples])
        num_examples = float(sums[-1])
        results = {k: _weighted_mean(float(v), num_examples) for k, v in zip(keys, sums)}
        results["set"] = "train"
        results["examples_per_sec"] = num_examples / max(time.time() - t0, 1e-9)
        results.update(timer.summary())
        self.log(results)
        self.epoch += 1
        return (
            results["phone_acc"],
            results["phone_loss"],
            results["word_acc"],
            results["word_loss"],
        )

    def _train_slu(self, dataset, print_interval):
        from tpu_slu.utils.profiling import StepTimer, profile_trace

        # Device-side metric accumulation (see _train_asr comment).
        total_loss = 0.0
        total_acc = 0.0
        num_examples = 0.0
        t0 = time.time()
        timer = StepTimer()
        self.model.print_frozen()
        mask = self.model.trainable_mask()
        if self.model_parallel <= 1:
            # one raveled device vector instead of L host scalars (optim.py)
            mask = jax.device_put(expand_mask(self.model.params, mask))
        profile_dir = getattr(self.config, "profile_dir", None) if self.epoch == 0 else None
        carry = self._params_carry()
        try:  # persist completed steps even on a mid-epoch exception
            with profile_trace(profile_dir):
                for idx, (bs, batch) in enumerate(self._batches(dataset)):
                    num_examples += bs
                    with timer.step():
                        carry, self.opt_state, (loss, acc) = self._train_step(
                            carry, self.opt_state, mask, self._next_step_idx(), batch
                        )
                    total_loss = total_loss + loss * bs
                    total_acc = total_acc + acc * bs
                    if idx % print_interval == 0:
                        print(f"intent loss: {float(loss)}")
                        print(f"intent acc: {float(acc)}")
        finally:
            try:
                self._set_params_carry(carry)
            except RuntimeError:
                pass  # carry donated into a failed step; see _train_asr note
        self.model.unfreeze_one_layer()  # per-epoch ULMFiT trigger (training.py:115)
        total_loss, total_acc, num_examples = _all_hosts_sum(
            [total_loss, total_acc, num_examples]
        )
        results = {
            "intent_loss": _weighted_mean(float(total_loss), num_examples),
            "intent_acc": _weighted_mean(float(total_acc), num_examples),
            "set": "train",
            "examples_per_sec": num_examples / max(time.time() - t0, 1e-9),
        }
        results.update(timer.summary())
        self.log(results)
        self.epoch += 1
        return results["intent_acc"], results["intent_loss"]

    def test(self, dataset, log_set: str = "valid"):
        if isinstance(dataset, ASRDataset):
            totals = {"phone_loss": 0.0, "phone_acc": 0.0, "word_loss": 0.0, "word_acc": 0.0}
            num_examples = 0.0
            for bs, batch in self._batches(dataset):
                num_examples += bs
                pl_, wl, pa, wa = self._eval_step(self.model.params, batch)
                totals["phone_loss"] = totals["phone_loss"] + pl_ * bs
                totals["word_loss"] = totals["word_loss"] + wl * bs
                totals["phone_acc"] = totals["phone_acc"] + pa * bs
                totals["word_acc"] = totals["word_acc"] + wa * bs
            keys = list(totals)
            sums = _all_hosts_sum([totals[k] for k in keys] + [num_examples])
            num_examples = float(sums[-1])
            results = {k: _weighted_mean(float(v), num_examples) for k, v in zip(keys, sums)}
            results["set"] = log_set
            self.log(results)
            return (
                results["phone_acc"],
                results["phone_loss"],
                results["word_acc"],
                results["word_loss"],
            )

        total_loss = 0.0
        total_acc = 0.0
        num_examples = 0.0
        for idx, (bs, batch) in enumerate(self._batches(dataset)):
            num_examples += bs
            loss, acc = self._eval_step(self.model.params, batch)
            total_loss = total_loss + loss * bs
            total_acc = total_acc + acc * bs
            if self.model.seq2seq and self.epoch >= getattr(self.config, "decode_acc_from_epoch", 2):
                # String-exact-match accuracy via beam decode
                # (reference training.py:158-165). Decode the full padded
                # batch (one compiled shape per bucket) and slice the strings;
                # true lengths select the length-exact path, so bucket/batch
                # padding never reaches the decode metric.
                n_real = int(bs)
                guesses = np.array(
                    self.model.decode_intents(batch["x"], lengths=batch.get("len"))[:n_real]
                )
                y_host = np.asarray(batch["y_intent"][:n_real])
                truths = np.array(
                    [
                        self.model.one_hot_to_string(y_host[i], self.model.Sy_intent)
                        for i in range(n_real)
                    ]
                )
                match = float((guesses == truths).mean())
                total_acc += match * bs
                print(f"decoding batch {idx}")
                print(f"acc: {match}")
                print(f"guess: {guesses[0]}")
                print(f"truth: {truths[0]}")
        total_loss, total_acc, num_examples = _all_hosts_sum(
            [total_loss, total_acc, num_examples]
        )
        results = {
            "intent_loss": _weighted_mean(float(total_loss), num_examples),
            "intent_acc": _weighted_mean(float(total_acc), num_examples),
            "set": log_set,
        }
        self.log(results)
        return results["intent_acc"], results["intent_loss"]
