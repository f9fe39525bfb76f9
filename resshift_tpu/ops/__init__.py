from .resize import resize, resize_matrix, upsample_nearest

__all__ = ["resize", "resize_matrix", "upsample_nearest"]
