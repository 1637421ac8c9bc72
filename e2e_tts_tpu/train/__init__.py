from .acoustic_step import (
    AcousticBatch,
    AcousticTrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)
from .optim import acoustic_optimizer, gan_optimizer, noam_schedule
from .vocoder_step import (
    VocoderBatch,
    VocoderTrainState,
    init_vocoder_train_state,
    make_vocoder_train_step,
)
