from .rdfjson import read_rdf_json, rdf_json_to_triples  # noqa: F401
from .ntriples import read_ntriples_lines  # noqa: F401
