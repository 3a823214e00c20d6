local root = '/data';
local split = 'train2014';
{ path: root + '/' + split + '/images',
  both: 'a' + 'b' + 'c' }
