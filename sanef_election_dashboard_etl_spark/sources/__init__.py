from .files import read_csv_dim, read_parquet
from .literal import reset_rows
from .rest import RestSource, fetch_json

__all__ = ["read_csv_dim", "read_parquet", "reset_rows", "RestSource", "fetch_json"]
