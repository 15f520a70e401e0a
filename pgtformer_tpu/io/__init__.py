from pgtformer_tpu.io.video import VideoReader, VideoWriter, sliding_windows
