from .readers import (  # noqa: F401
    load_json,
    load_parquet,
    load_parquet_partitioned,
    load_raw_csvs,
    load_table,
    load_testdata,
)
from .writers import (  # noqa: F401
    write_csv,
    write_json_metrics,
    write_parquet,
    write_parquet_partitioned,
    VersionedOutputStore,
)
