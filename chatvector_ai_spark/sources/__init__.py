from chatvector_ai_spark.sources.tables import (  # noqa: F401
    ALIAS_SCHEMA,
    DOCUMENTS_SCHEMA,
    read_alias_dict,
    read_documents,
    read_testdata_table,
    write_snapshot,
)
