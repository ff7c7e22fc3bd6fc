"""ictspark — PySpark-native rebuild of Sha0S/ICT_log_parser's capabilities.

Parse → enrich → route → aggregate over multi-turn agent transcripts
(conv_id, turn_idx, role, text, tool, ts). See SURVEY.md / SEMANTICS.md.
"""

__version__ = "0.1.0"
