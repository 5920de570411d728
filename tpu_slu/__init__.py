"""tpu-slu: TPU-native end-to-end Spoken Language Understanding in JAX/Pallas.

A from-scratch rebuild of the capabilities of ``lorenlugosch/end-to-end-SLU``
(see SURVEY.md) designed TPU-first: pure-functional models under ``jit``,
``lax.scan``/Pallas GRUs, static-shape bucketed input pipelines, and
``shard_map``/pjit data parallelism over a device mesh.

Public surface (mirrors the reference README recipe, README.md:26-41 of the
reference):

    from tpu_slu import read_config, get_SLU_datasets, Model
    config = read_config("experiments/no_unfreezing.cfg")
    train, valid, test = get_SLU_datasets(config)
    model = Model(config)
    model.load_torch_state_dict("experiments/no_unfreezing/training/model_state.pth")
    model.decode_intents(signal)   # -> [["activate", "lights", "kitchen"]]
"""

from tpu_slu.config import Config, read_config

__version__ = "0.1.0"

__all__ = [
    "Config",
    "read_config",
    "get_SLU_datasets",
    "get_ASR_datasets",
    "Model",
    "PretrainedModel",
    "Trainer",
]


def __getattr__(name):
    # Lazy imports keep `import tpu_slu` light (no jax/pandas import cost)
    # and avoid circular imports between data/models/training.
    if name in ("get_SLU_datasets", "get_ASR_datasets"):
        from tpu_slu.data import datasets

        return getattr(datasets, name)
    if name in ("Model", "PretrainedModel"):
        from tpu_slu import models

        return getattr(models, name)
    if name == "Trainer":
        from tpu_slu.training.trainer import Trainer

        return Trainer
    raise AttributeError(f"module 'tpu_slu' has no attribute {name!r}")
