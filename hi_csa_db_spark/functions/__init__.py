from hi_csa_db_spark.functions.text import (  # noqa: F401
    strip_punct,
    tokenize,
    absolutize_url,
    slugify,
    extract_code,
    strip_brackets,
)
from hi_csa_db_spark.functions.hashing import (  # noqa: F401
    md5_hex,
    hex_to_long,
    stable_long_hash,
)
from hi_csa_db_spark.functions.vectors import (  # noqa: F401
    dot,
    norm,
    cosine,
)
