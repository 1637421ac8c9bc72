from .ctc import forward_sum_loss
from .length_regulator import (
    average_by_segments,
    durations_to_mel2ph,
    expansion_matrix,
    regulate_length,
    sum_by_words,
)
from .mas import monotonic_align
from .masking import attn_mask, mask_fill, sequence_mask
from .pitch import bucketize, f0_to_coarse
