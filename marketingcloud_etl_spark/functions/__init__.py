from .money import dec  # noqa: F401
from .hashing import content_hash  # noqa: F401
from .vectors import cosine, dot, l2norm, to_double_array  # noqa: F401
from .text import tokens, distinct_tokens  # noqa: F401
