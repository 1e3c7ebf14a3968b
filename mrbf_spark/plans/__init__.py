from .inspect import physical_plan, scan_line, explain_catalog

__all__ = ["physical_plan", "scan_line", "explain_catalog"]
