from a3vlm_tpu.ops.attention import (
    attention,
    right_aligned_causal_mask,
    sdpa_reference,
)
from a3vlm_tpu.ops.norms import layer_norm, rms_norm
from a3vlm_tpu.ops.rope import apply_rotary_emb, precompute_freqs_cis
from a3vlm_tpu.ops.sampling import sample_token, sample_top_p

__all__ = [
    "attention",
    "right_aligned_causal_mask",
    "sdpa_reference",
    "layer_norm",
    "rms_norm",
    "apply_rotary_emb",
    "precompute_freqs_cis",
    "sample_token",
    "sample_top_p",
]
