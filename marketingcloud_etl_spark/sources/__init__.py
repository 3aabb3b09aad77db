from .rest import RestPagesDataSource, register_rest_source, fetch_pages_to_df  # noqa: F401
