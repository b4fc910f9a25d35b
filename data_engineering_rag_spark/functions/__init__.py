from .paths import extension_of, normalize_path, should_skip, SKIP_SQL_SNIPPETS
from .text import strip_code_fence_col

__all__ = [
    "extension_of",
    "normalize_path",
    "should_skip",
    "SKIP_SQL_SNIPPETS",
    "strip_code_fence_col",
]
