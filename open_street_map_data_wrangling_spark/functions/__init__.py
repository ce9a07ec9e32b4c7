from .textfeat import shingles_expr, SHINGLES_SQL_CTE

__all__ = ["shingles_expr", "SHINGLES_SQL_CTE"]
