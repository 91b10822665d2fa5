"""`python -m real_time_mobility_heatmap_spark` — run the composed
pipeline (see pipeline.py for the environment contract)."""

from .pipeline import main

raise SystemExit(main())
