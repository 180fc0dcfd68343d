from .msda import ms_deform_attn, ms_deform_attn_core

__all__ = ["ms_deform_attn", "ms_deform_attn_core"]
