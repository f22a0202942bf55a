"""btd — a from-scratch, PySpark-native engine with the query and
data-processing capabilities of FedericoPonzi/BillionTriplesDataset,
extended into a knowledge-graph construction pipeline over multi-turn
transcript tables (see SURVEY.md).

Everything is DataFrame/SQL-first: reference operators compile to
built-in Catalyst expressions; only the KG extraction/scoring kernels
use vectorized pandas/Arrow UDFs (never per-row Python).
"""

__version__ = "0.1.0"
