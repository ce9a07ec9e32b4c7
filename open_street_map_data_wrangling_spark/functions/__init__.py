from .textfeat import shingles_expr, SHINGLES_SQL_CTE
from .vectors import cosine_expr, dot_expr

__all__ = ["shingles_expr", "SHINGLES_SQL_CTE", "cosine_expr", "dot_expr"]
