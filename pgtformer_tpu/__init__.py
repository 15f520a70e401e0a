"""pgtformer_tpu — a TPU-native (JAX/XLA/Pallas) blind video face restoration framework.

Re-designed from scratch with the capabilities of kepengxu/PGTFormer
("Beyond Alignment: Blind Video Face Restoration via Parsing-Guided
Temporal-Coherent Transformer", IJCAI 2024).

Layout conventions (TPU-first, unlike the reference's NCHW/5D reshape style):
  * videos / feature maps are channels-last:  [B, T, H, W, C]
  * latents are channels-last:                [B*T, h, w, D]
  * static shapes everywhere; all control flow resolved at trace time.
"""

__version__ = "0.1.0"

from pgtformer_tpu.registry import ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY, MODEL_REGISTRY
