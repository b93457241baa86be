from .vector import cosine_similarity, dot_product, l2_norm, l2_normalize  # noqa: F401
