from pgtformer_tpu.nn.blocks import (
    ResnetBlock,
    Upsample,
    Downsample,
    Mlp,
    WindowAttention3D,
    SWTransformerBlock,
    EncoderLayer,
    DecoderLayer,
)
from pgtformer_tpu.nn.transformer import TransformerSALayer, MultiHeadSelfAttention
