from .ssim import mssim_loss
