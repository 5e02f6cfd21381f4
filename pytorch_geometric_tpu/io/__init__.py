from .mesh import read_off, write_off, read_obj, read_ply
from .txt import read_txt_array, parse_txt_array

__all__ = ['read_off', 'write_off', 'read_obj', 'read_ply',
           'read_txt_array', 'parse_txt_array']
