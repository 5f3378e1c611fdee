from .tables import TABLES, load_table  # noqa: F401
from .apache_log import CLF_REGEX, parse_clf_lines, read_apache_log  # noqa: F401
