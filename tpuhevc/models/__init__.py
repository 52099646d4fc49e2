"""Model zoo: the NN-FME fractional-pel MLP (the fork's contribution) and
its training pipeline (SURVEY.md §2.4, reference TEncSearch.cpp:53-204 +
NN_training.ipynb)."""
