from . import color, interval, rng, vecmath  # noqa: F401
