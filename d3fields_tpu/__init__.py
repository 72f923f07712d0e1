"""D3Fields-TPU: a TPU-native (JAX/XLA/Pallas) implicit 3D descriptor-field framework.

A ground-up rebuild of the capabilities of D3Fields (dynamic 3D descriptor
fields: multi-view RGB-D fusion into a queryable field of signed distance,
semantic descriptors, and instance-mask probabilities), designed TPU-first:

- the field core is a set of pure, jittable functions over a ``FieldState``
  pytree (reference: ``fusion.py:202-545`` class state + eval methods);
- the hot query path (project -> visibility -> bilinear gather -> weighted
  multi-view fusion) is a fused Pallas kernel that maps the feature gather
  onto the MXU via interpolation-matrix matmuls;
- foundation models (DINOv2 / SAM / GroundingDINO / XMem) are JAX
  reimplementations behind a common ``FeatureBackend`` protocol;
- scale-out is expressed with ``jax.sharding.Mesh`` + ``shard_map`` over
  view/point axes, not host loops.
"""

__version__ = "0.2.0"

from d3fields_tpu.config import Boundaries, D3FieldsConfig, FusionConfig
from d3fields_tpu.fields.state import FieldState
from d3fields_tpu.fields.fusion import Fusion, eval_field, eval_dist, batch_eval
from d3fields_tpu.serving import (
    AsyncFrameLoop, host_prefetch, prefetch_to_device,
)

__all__ = [
    "Boundaries",
    "D3FieldsConfig",
    "FusionConfig",
    "FieldState",
    "Fusion",
    "eval_field",
    "eval_dist",
    "batch_eval",
    "AsyncFrameLoop",
    "host_prefetch",
    "prefetch_to_device",
]
