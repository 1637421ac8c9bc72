from .acoustic import FastSpeech2
from .acoustic_loss import fastspeech2_loss
from .blocks import available_blocks, build_decoder, build_encoder, register_block
from .vocoder import build_generator, fuse_weight_norm, istft_to_audio, vocode

# ensure optional block families register themselves when present
from . import blocks as _blocks  # noqa: F401
