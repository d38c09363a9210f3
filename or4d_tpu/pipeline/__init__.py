"""Pipeline stages around the core models: instance labeling (L2), role
prediction (L4), surgery-phase recognition (L4), and the interchange-format
writers that downstream programs consume."""
