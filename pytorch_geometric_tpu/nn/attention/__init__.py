from .performer import PerformerAttention
from .sgformer import SGFormerAttention
from .polynormer import PolynormerAttention
from .qformer import QFormer

__all__ = ['PerformerAttention', 'SGFormerAttention',
           'PolynormerAttention', 'QFormer']
