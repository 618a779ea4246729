from rocket_etl_spark.functions.hashing import sha256_content, sha256_expr
from rocket_etl_spark.functions.lang import normalize_lang, normalize_lang_expr

__all__ = ["sha256_content", "sha256_expr", "normalize_lang", "normalize_lang_expr"]
