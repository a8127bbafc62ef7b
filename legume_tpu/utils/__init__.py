from .prng import DEFAULT_PROJECTION_SEED, key_from_seed, mix_seed
