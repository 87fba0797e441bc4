from . import vecmath, rng
