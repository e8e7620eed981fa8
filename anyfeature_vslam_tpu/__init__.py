"""TPU-native feature-agnostic monocular V-SLAM.

A brand-new JAX/XLA/Pallas implementation of the AnyFeature-VSLAM capability
surface (reference: alejandrofontan/AnyFeature-VSLAM): pluggable feature
detection/description with per-feature size/sigma normalization, batched
descriptor matching, tracking + pose optimization, local-mapping bundle
adjustment with Schur-complement LM (sharded across a TPU mesh), and Sim3
loop closing.

Compute path is JAX (jit/pallas/shard_map); host orchestration replaces the
reference's three mutex-coupled threads with an explicit dataflow pipeline.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry / optimization code is float32 end-to-end; on TPU the default
# matmul precision is bfloat16 which is far too coarse for pose math (the
# reference runs g2o in float64). Pallas/compute kernels that want bf16
# request it explicitly via preferred_element_type.
_jax.config.update("jax_default_matmul_precision", "highest")
