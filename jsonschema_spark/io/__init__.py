from .tables import load_fact_table, load_dim_table

__all__ = ["load_fact_table", "load_dim_table"]
