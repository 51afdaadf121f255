#include "bimap.hpp"
