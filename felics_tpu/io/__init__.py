from felics_tpu.io.images import load_image, save_image

__all__ = ["load_image", "save_image"]
