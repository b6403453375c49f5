from .sectioning import extract_titles, split_paragraphs, assign_sections  # noqa: F401
from .chunking import RecursiveCharacterSplitter, chunk_sections  # noqa: F401
from .embedding import embed_text_udf, with_embeddings  # noqa: F401
from .similarity import topk_similar, topk_per_group, normalize_scores, knn_join  # noqa: F401
