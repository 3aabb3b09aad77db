from .lead_activity import (  # noqa: F401
    flatten_lead_activity,
    bulk_extract,
    incremental_extract,
)
