from .common import (
    Conv1d,
    LayerNorm,
    WNConv1d,
    WNConvTranspose1d,
    grad_scale,
    sinusoid_table,
    t2t_sinusoid,
)
from .discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_adv_loss,
)
from .hifigan import HifiGanGenerator, IstftNetGenerator, ResBlock1, ResBlock2
from .postnet import Postnet
from .transformer import FFTBlock, TransformerDecoder, TransformerEncoder
from .variance import (
    AlignmentEncoder,
    DurationPredictor,
    FeatureStats,
    VarianceAdaptor,
    VariancePredictor,
)
