from pgtformer_tpu.models.quantizer import RQBottleneck
from pgtformer_tpu.models.vae import Encoder3D, Decoder3D, TDCRQVAE3
from pgtformer_tpu.models.parser import BiSeNet
from pgtformer_tpu.models.pgtformer import PGTFormer
