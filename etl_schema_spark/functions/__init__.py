from .table_functions import (
    metric_geomean,
    metric_geomean_oracle,
    metric_pdf,
    metric_pdf_oracle,
)

__all__ = ["metric_pdf", "metric_pdf_oracle", "metric_geomean", "metric_geomean_oracle"]
