from find_that_charity_spark.sources.corpus import (  # noqa: F401
    WEB_PAGES_SCHEMA,
    read_corpus,
    read_table,
)
from find_that_charity_spark.sources.synth import (  # noqa: F401
    ENTITY_NAMES,
    synth_queries,
    synth_web_pages,
    write_fixture,
)
