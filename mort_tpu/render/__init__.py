from .renderer import render, to_u8, to_u8_np

__all__ = ["render", "to_u8", "to_u8_np"]
