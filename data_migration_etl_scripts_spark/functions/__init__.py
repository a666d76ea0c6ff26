"""Column-expression function library (no Python UDFs on the hot path).

Every scalar transform the reference implements as a pandas lambda/UDF
(SURVEY.md §2.7 F1-F18) re-expressed as built-in Spark Column
expressions so the whole plan stays inside whole-stage codegen.
"""

from data_migration_etl_scripts_spark.functions.cleaning import (  # noqa: F401
    strip_or_null,
    strip_keep_empty,
    scrub_null_literal,
    clean_string_columns,
    normalized_key,
)
from data_migration_etl_scripts_spark.functions.contact import clean_contact  # noqa: F401
from data_migration_etl_scripts_spark.functions.dates import (  # noqa: F401
    parse_multiformat_ts,
    add_years,
)
from data_migration_etl_scripts_spark.functions.numeric import (  # noqa: F401
    try_numeric,
    bounded_abs,
    derive_missing_of_three,
)
from data_migration_etl_scripts_spark.functions.recode import (  # noqa: F401
    recode,
    domain_restrict,
)
