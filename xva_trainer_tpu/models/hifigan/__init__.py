from .models import (
    HifiganConfig,
    Generator,
    HifiganDiscriminator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    feature_matching_loss,
    discriminator_loss,
    generator_adv_loss,
)
