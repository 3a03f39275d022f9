"""Pure-Python parity kernels.

These functions reproduce, byte-for-byte where observable, the text
transformation semantics of the reference implementation (readur). They have
no Spark dependency so they can run (a) inside Arrow-batched pandas UDFs on
executors and (b) directly in unit tests as the golden oracle.

Every kernel cites the reference behavior it mirrors (file:line into
/root/reference) in its docstring.
"""

from readur_spark.kernels.textnorm import (  # noqa: F401
    clean_extracted_text,
    remove_null_bytes,
    repair_hyphenation,
    plain_text_read,
    TEXT_TRUNCATION_SUFFIX,
)
from readur_spark.kernels.wordcount import (  # noqa: F401
    count_words_in_text,
    count_words_optimized,
    count_words_safely_enhanced,
    count_words_safely_office,
)
from readur_spark.kernels.quality import (  # noqa: F401
    validate_ocr_quality,
    pdf_text_quality_sufficient,
    classify_ocr_error,
)
