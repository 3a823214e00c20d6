from .decoding import (
    encode_and_greedy_decode_t5,
    forced_decode_t5,
    greedy_decode_gpt2,
    greedy_decode_t5,
    sequence_scores,
)
from .prefix_splice import (
    T5_SENTINEL_BASE,
    insert_prefix_into_input,
    splice_output_length,
)

__all__ = [
    "T5_SENTINEL_BASE",
    "encode_and_greedy_decode_t5",
    "forced_decode_t5",
    "greedy_decode_gpt2",
    "greedy_decode_t5",
    "insert_prefix_into_input",
    "sequence_scores",
    "splice_output_length",
]
