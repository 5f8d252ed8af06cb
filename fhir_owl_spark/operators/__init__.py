from . import (  # noqa: F401
    dedup,
    dictionary,
    hierarchy,
    mentions,
    multimodal,
    similarity,
    skew,
    text,
)
