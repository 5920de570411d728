"""Model families: ASR pre-training encoder and SLU models.

Pure-functional cores (param pytrees + jitted apply functions) with thin
stateful facades (:class:`PretrainedModel`, :class:`Model`) that preserve the
reference's README embedding API (reference ``README.md:26-41``).
"""

from tpu_slu.models.encoder import EncoderArch, PretrainedModel
from tpu_slu.models.slu import Model

__all__ = ["EncoderArch", "PretrainedModel", "Model"]
