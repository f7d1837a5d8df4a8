from sgdnet_tpu.families.families import (
    Binomial,
    Family,
    Gaussian,
    Multinomial,
    MultivariateGaussian,
    get_family,
)

__all__ = [
    "Family",
    "Gaussian",
    "Binomial",
    "Multinomial",
    "MultivariateGaussian",
    "get_family",
]
