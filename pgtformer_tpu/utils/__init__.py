from pgtformer_tpu.utils.logging import get_root_logger
from pgtformer_tpu.utils.checkpoint import CheckpointManager
