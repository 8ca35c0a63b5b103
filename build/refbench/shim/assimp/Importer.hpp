#pragma once
namespace Assimp { struct Importer {}; }
