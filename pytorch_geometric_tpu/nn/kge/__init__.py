from .models import KGEModel, TransE, DistMult, ComplEx, RotatE

__all__ = ['KGEModel', 'TransE', 'DistMult', 'ComplEx', 'RotatE']
