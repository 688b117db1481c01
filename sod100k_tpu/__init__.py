"""sod100k_tpu — a TPU-native (JAX/XLA/Pallas) salient-object-detection framework.

A from-scratch rebuild of the capabilities of ShangHua-Gao/SOD100K
(CSNet ~100K-param SOD with generalized Octave Convolutions, dynamic-weight-decay
channel pruning, and the CSF+Res2Net variant), designed TPU-first:

- multi-resolution "octave" feature sets are static pytrees of NHWC arrays,
  compiled by XLA into fused convolutions (MXU) + resampling,
- training/eval steps are pure jitted functions; data parallelism is expressed
  with `jax.sharding.Mesh` + NamedSharding over ICI,
- the dynamic-weight-decay FLOPs penalty is an explicit differentiable
  regularizer (no forward hooks needed),
- evaluation (MAE / 256-threshold precision-recall / F-beta) is a vectorized
  on-device reduction, with a native C++ CLI clone for the reference's
  SalMetric tool.

Layout:
    ops/       functional conv/resample/norm kernels and the gOctConv family
    arch/      layer_config (architecture-as-data) + CSNet / CSF+Res2Net builders
    interop/   PyTorch checkpoint + pickled layer_config readers
    data/      host decode + device-side preprocess pipeline
    metrics/   on-device SalMetric suite (+ native/ C++ CLI clone)
    train/     loss, optimizer groups, train/val steps, checkpointing
    prune/     BN-gamma thresholding -> slim layer_config -> weight gather
    parallel/  mesh / sharding helpers
    config/    yacs-compatible CfgNode so reference YAML configs load unchanged
"""

__version__ = "0.2.0"
