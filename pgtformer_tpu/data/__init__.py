from pgtformer_tpu.data import degradations
from pgtformer_tpu.data.vfhq import (
    VFHQClipDataset, VFHQTrainDataset, VFHQTestDataset)
