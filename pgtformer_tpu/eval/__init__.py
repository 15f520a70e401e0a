from pgtformer_tpu.eval.metrics import (
    calculate_psnr, calculate_ssim, calculate_lpips_fn,
    landmark_distance, temporal_landmark_error, identity_degradation)
