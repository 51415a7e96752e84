"""Back-compat shim: the rectangular-attention kernel was PROMOTED to
the model path in round 5 (ops/pallas_rect_attention.py) after the
round-5 train-step profile showed cross-attention at ~27 ms of the
56.5 ms bf16 step — the round-3 demotion measured the kernel with f32
multi-pass matmuls inside an f32 step, which is why it lost then. The
promoted kernel adds bf16 operand selection, arbitrary-length padding
(Lk to the lane quantum with an in-kernel column guard), and the flash
backward is the production path. History and measurements live in the
ops module docstring.
"""

from multimodalreactiongeneration_tpu.ops.pallas_rect_attention import (  # noqa: F401
    BLOCK_Q,
    NEG_INF,
    rect_attention,
    rect_attention_mha,
)
