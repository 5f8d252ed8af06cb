from . import owl_xml, table_io  # noqa: F401
