from .native import pack_frames, native_available

__all__ = ["pack_frames", "native_available"]
