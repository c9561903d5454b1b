from .datagen import generate_pages, pages_schema  # noqa: F401
from .extract import extract_page, extract_links_df  # noqa: F401
from .graph_build import build_graph  # noqa: F401
from .graph_io import (  # noqa: F401
    read_mtx,
    write_mtx,
    read_bin_csc,
    write_bin_csc,
    read_bin_header,
    GraphFormatError,
)
from .pages_io import read_pages, validate_pages_schema, PagesSchemaError  # noqa: F401
