from .turtle import DocError, parse_document, parse_ntriples_statement  # noqa: F401
from .lexical import (  # noqa: F401
    RDF_TYPE, RDF_NIL, RDF_FIRST, RDF_REST,
    XSD_STRING, XSD_BOOLEAN, XSD_INTEGER, XSD_DECIMAL, XSD_DOUBLE,
    XSD_DATE, XSD_DATE_TIME, XSD_TIME,
)
