"""Quality metrics (PSNR / SSIM / MS-SSIM / LPIPS)."""

from .quality import (psnr, ssim, ms_ssim, rgb_to_gray_u8,
                      EvaluationMetrics)

__all__ = ["psnr", "ssim", "ms_ssim", "rgb_to_gray_u8", "EvaluationMetrics"]
