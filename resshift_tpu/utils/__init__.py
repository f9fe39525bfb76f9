from . import image_io

__all__ = ["image_io"]
