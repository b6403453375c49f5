from .text import is_title, TITLE_REGEX  # noqa: F401
from .vector import dot, l2_norm, cosine_similarity, cosine_distance  # noqa: F401
