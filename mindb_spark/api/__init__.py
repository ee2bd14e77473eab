"""HTTP serving layer (reference parity: ``mindb/api/fastapi.py``)."""

from mindb_spark.api.rest import RestServer, serve

__all__ = ["RestServer", "serve"]
