"""Device mesh + sharding layout + data-parallel train step.

Layout policy for this model family (~4 M params, SURVEY.md §5):

* **data axis**: batches sharded on their leading dim; gradients all-reduced
  over ICI by GSPMD (`psum` inserted automatically by XLA under jit with
  sharded inputs + replicated-param outputs).
* **model axis**: parameters are replicated except the output-vocab heads —
  ``word_linear`` is (256, 10000) in the default config, the one matrix whose
  activations/gradients are worth sharding. Its output dim shards over
  ``model`` (column parallelism: no collective needed in the forward; the
  frame-CE loss reduces over the sharded axis, which XLA turns into a
  reduce-scatter + all-reduce of scalars).

Works identically on a real TPU slice and on the CPU
``xla_force_host_platform_device_count`` test mesh.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """1-D data mesh, or 2-D (data, model) when ``model_parallel > 1``."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"asked for {n_devices} devices, have {len(devices)}")
    if n_devices % model_parallel != 0:
        raise ValueError(f"{n_devices} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices[:n_devices]).reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_shardings(mesh: Mesh, batch_template: dict):
    """Every batch leaf sharded on its leading (batch) dim over ``data``."""

    def leaf(x):
        spec = [DATA_AXIS] + [None] * (np.ndim(x) - 1)
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf, batch_template)


def param_shardings(mesh: Mesh, params: dict, shard_vocab_heads: bool = True):
    """Replicate params; shard the big vocab-head matrices over ``model``.

    Only applies when the mesh actually has a model axis > 1 and the head's
    output dim divides evenly.
    """
    replicated = NamedSharding(mesh, P())
    shardings = jax.tree.map(lambda _: replicated, params)
    model_size = mesh.shape[MODEL_AXIS]
    if not shard_vocab_heads or model_size <= 1:
        return shardings

    # PretrainedModel params at top level; Model params nest them.
    root = params.get("pretrained_model", params)
    root_shardings = shardings.get("pretrained_model", shardings)
    for head in ("word_linear", "phoneme_linear"):
        if head in root:
            w = root[head]["w"]
            if w.shape[-1] % model_size == 0:
                root_shardings[head] = {
                    "w": NamedSharding(mesh, P(None, MODEL_AXIS)),
                    "b": NamedSharding(mesh, P(MODEL_AXIS)),
                }
    return shardings


def opt_state_shardings(mesh: Mesh, params, p_shard, opt_state):
    """Shardings for an optimizer state, derived from its actual structure.

    Entries whose pytree structure mirrors ``params`` (per-leaf Adam m/v)
    take the matching param sharding leaf-for-leaf — except leaves whose
    rank differs from the param's (e.g. per-leaf scalar step counts), which
    replicate. Everything else (flat Adam's raveled m/v vectors, (L,) step
    vectors) replicates.
    """
    rep = NamedSharding(mesh, P())
    p_struct = jax.tree.structure(params)

    def entry(v):
        if jax.tree.structure(v) == p_struct:
            return jax.tree.map(
                lambda s, pl, ol: s if np.ndim(ol) == np.ndim(pl) else rep,
                p_shard, params, v,
            )
        return jax.tree.map(lambda _: rep, v)

    return {k: entry(v) for k, v in opt_state.items()}


def make_dp_train_step(step_fn, mesh: Mesh, params, opt_state, batch_template,
                       extra_arg_shardings=()):
    """jit ``step_fn(params, opt_state, *extras, batch)`` with mesh shardings.

    Params/opt-state replicated (vocab heads model-sharded), batch
    data-sharded. Returns the jitted step; XLA inserts the ICI gradient
    all-reduce.
    """
    p_shard = param_shardings(mesh, params)
    o_shard = opt_state_shardings(mesh, params, p_shard, opt_state)
    b_shard = batch_shardings(mesh, batch_template)
    return jax.jit(
        step_fn,
        in_shardings=(p_shard, o_shard, *extra_arg_shardings, b_shard),
        out_shardings=(p_shard, o_shard, None),
        donate_argnums=(0, 1),
    )


def shard_batch(batch: dict, mesh: Mesh):
    """Device-put a host batch with data-axis sharding."""
    return jax.device_put(batch, batch_shardings(mesh, batch))


def make_dp_infer(infer_fn, mesh: Mesh, params, input_template):
    """jit ``infer_fn(params, *inputs)`` data-parallel over the mesh.

    Inference-side SPMD (serving / batch eval): params replicated, every
    input leaf sharded on its leading batch dim over ``data``; outputs are
    left unconstrained so per-example results stay batch-sharded and XLA
    inserts no gather until the host reads them. The batch dim must divide
    the data-axis size (use the bucketed loader's fixed batch, or pad —
    ``predict_intents(lengths=)`` makes padding exact).

    The reference has no multi-device inference story at all (SURVEY.md §2
    "parallelism inventory — explicitly absent"); this is the TPU-native
    equivalent of scaling ``decode_intents`` over chips.
    """
    p_shard = param_shardings(mesh, params, shard_vocab_heads=False)
    x_shard = batch_shardings(mesh, input_template)
    if not isinstance(input_template, (tuple, list)):
        x_shard = (x_shard,)
    return jax.jit(infer_fn, in_shardings=(p_shard, *x_shard))
