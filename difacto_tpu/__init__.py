"""difacto_tpu — a TPU-native factorization-machine engine.

From-scratch re-design of dmlc/difacto for JAX/XLA/Pallas: sharded sparse
tables + collectives replace the ps-lite parameter server; a jit'd SPMD
train step replaces the async worker loop. See SURVEY.md for the layer map.
"""

__version__ = "0.1.0"

from .config import Config, DataParam, FMParam, LearnerParam, ShardParam  # noqa: F401
