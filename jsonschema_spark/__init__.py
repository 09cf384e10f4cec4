"""jsonschema_spark — a PySpark-native schema + constraint validation engine.

Generalizes JSON-Schema ``validate(doc) -> violations`` semantics into
set-oriented DataFrame passes over web-scale image+caption tables
(BASELINE.json north_rule). See SURVEY.md for the blueprint.
"""

from .spec import Spec, SpecNode, parse, parse_node
from .local import Violation, validate, is_valid

__all__ = ["Spec", "SpecNode", "parse", "parse_node", "Violation", "validate", "is_valid"]
__version__ = "0.1.0"
