"""diffsep_tpu — a TPU-native (JAX / Flax / pjit / Pallas) framework for
diffusion-based source separation and speech enhancement.

Re-designed from scratch with the capabilities of fakufaku/diffusion-separation
(DiffSep, ICASSP 2023).  The compute path is JAX/XLA with Pallas TPU kernels
for the hot ops; parallelism is expressed with `jax.sharding.Mesh` + `pjit` /
`shard_map` over ICI rather than NCCL process groups.

Layering (bottom-up):
  ops/       dsp + resampling kernels (STFT, upfirdn2d, fused activations)
  sde/       diffusion-mixing SDE library (MixSDE, PriorMixSDE, OUVE, OUVP)
  sampling/  predictor-corrector samplers compiled to a single lax.scan
  models/    Flax score networks (NCSN++, DiffuSE, TCN, DPTNet) + losses
  data/      dataset readers, collation, bucketing, host->device prefetch
  train/     pjit training loop, EMA, grad clipping, checkpointing
  parallel/  device mesh construction + sharded inference fan-out
  utils/     registry, running stats, linalg, misc
  config/    YAML config tree (hydra-compatible layout and names)
  cli/       train / separate / evaluate entry points
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences: diffsep_tpu.DiffSepModel / compose."""
    if name == "DiffSepModel":
        from .model import DiffSepModel

        return DiffSepModel
    if name == "compose":
        from .config import compose

        return compose
    raise AttributeError(name)
